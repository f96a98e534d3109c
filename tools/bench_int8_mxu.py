"""Micro-benchmark: int8 vs bf16 MXU rate through Pallas on this chip.

Gate for the round-5 fused int8 detector attempt (VERDICT r4 #3). The
prior XLA int8 lowering LOST to bf16 (16.4 vs 9.6 ms at batch 128,
docs/PERF.md) because of the f32 dequant->leaky->requant chain between
layers; a fused Pallas ladder would keep activations int8 in VMEM and
requant in the epilogue. That is only worth building if the raw MXU
int8 rate actually exceeds bf16 on this hardware THROUGH MOSAIC — this
tool measures exactly that, on detector-shaped matmuls
(im2col'd 3x3 convs: M = spatial, K = 9*Cin, N = Cout).

Method: K-blocked Pallas matmul, identical structure for both dtypes
(s8 x s8 -> s32 vs bf16 x bf16 -> f32), whole-array timing by chained
iteration + scalar readback (the house method: block_until_ready does
not sync on this backend), median over groups.

Usage: python tools/bench_int8_mxu.py [--m 8192] [--k 2304] [--n 256]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def build_matmul(dtype_in, dtype_acc, m, k, n, bm, bk, bn,
                 interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    if bk >= k:
        # whole-K: one dot per (i, j) block, no accumulate-revisit —
        # the fused-ladder regime (weights resident, no k-grid
        # overhead). This is the honest gate number.
        def kernel(a_ref, b_ref, o_ref):
            o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                               preferred_element_type=dtype_acc)

        return pl.pallas_call(
            kernel,
            grid=(m // bm, n // bn),
            in_specs=[
                pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
                pl.BlockSpec((k, bn), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((m, n), dtype_acc),
            interpret=interpret,
        )

    def kernel(a_ref, b_ref, o_ref):
        @pl.when(pl.program_id(2) == 0)
        def _init():
            o_ref[:] = jnp.zeros_like(o_ref)

        o_ref[:] += jnp.dot(a_ref[:], b_ref[:],
                            preferred_element_type=dtype_acc)

    grid = (m // bm, n // bn, k // bk)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), dtype_acc),
        interpret=interpret,
    )


def time_op(fn, a, b, iters, groups):
    """Chained iteration timing with scalar readback (house method)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(a, b):
        def body(c, _):
            o = fn(a, b)
            # fold the result into a scalar carry so iterations chain
            return c + o[0, 0].astype(jnp.float32), None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    _ = float(run(a, b))                      # compile + warm
    times = []
    for _g in range(groups):
        t0 = time.perf_counter()
        _ = float(run(a, b))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=8192)
    ap.add_argument("--k", type=int, default=2304)  # 9 * 256 (3x3 conv)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--bm", type=int, default=512)
    ap.add_argument("--bk", type=int, default=384)  # must be mult of 128
    ap.add_argument("--bn", type=int, default=256)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--groups", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    m, k, n = args.m, args.k, args.n
    flops = 2.0 * m * k * n
    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 127, (m, k), np.int8))
    b8 = jnp.asarray(rng.integers(-127, 127, (k, n), np.int8))
    a16 = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
    b16 = jnp.asarray(rng.normal(size=(k, n)), jnp.bfloat16)

    results = {}
    for name, fn, (a, b) in (
        ("bf16", build_matmul(jnp.bfloat16, jnp.float32, m, k, n,
                              args.bm, args.bk, args.bn,
                              interpret=args.cpu), (a16, b16)),
        ("int8", build_matmul(jnp.int8, jnp.int32, m, k, n,
                              args.bm, args.bk, args.bn,
                              interpret=args.cpu), (a8, b8)),
    ):
        try:
            dt = time_op(fn, a, b, args.iters, args.groups)
            results[name] = dt
            print(f"{name}: {dt * 1e6:.1f} us  "
                  f"{flops / dt / 1e12:.1f} TF/s", flush=True)
        except Exception as e:  # Mosaic may reject a dtype outright
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
            results[name] = None
    if results.get("bf16") and results.get("int8"):
        print(f"int8 speedup vs bf16: "
              f"{results['bf16'] / results['int8']:.2f}x")


if __name__ == "__main__":
    main()
