"""Per-layer MXU utilization profile of the yolov4-tiny conv stack.

Times each conv layer of the detector in isolation (lax.scan-chained
iterations, scalar readback sync — the bench.py methodology for this
machine's async tunnel) and reports achieved TFLOP/s vs the chip's bf16
peak, localizing which layers hold the detector at ~14% MXU
(docs/PERF.md) — the round-3 Pallas/reparametrization targets.

Workload contract: the reference's YOLOv4-tiny 416 conv stack
(src/object_detection.cpp:61-106; architecture models/yolov4_tiny.py).

Usage: python tools/profile_detector_layers.py [--batch 64] [--iters 32]
       [--cpu]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

sys.path.insert(0, ".")

# (name, H_in, Cin, Cout, kernel, stride) — YoloV4Tiny.__call__ order.
LAYERS = [
    ("ConvBN_0", 416, 3, 32, 3, 2),
    ("ConvBN_1", 208, 32, 64, 3, 2),
    ("ConvBN_2", 104, 64, 64, 3, 1),
    ("CSP0_a", 104, 32, 32, 3, 1),
    ("CSP0_b", 104, 32, 32, 3, 1),
    ("CSP0_t", 104, 64, 64, 1, 1),
    ("ConvBN_3", 52, 128, 128, 3, 1),
    ("CSP1_a", 52, 64, 64, 3, 1),
    ("CSP1_b", 52, 64, 64, 3, 1),
    ("CSP1_t", 52, 128, 128, 1, 1),
    ("ConvBN_4", 26, 256, 256, 3, 1),
    ("CSP2_a", 26, 128, 128, 3, 1),
    ("CSP2_b", 26, 128, 128, 3, 1),
    ("CSP2_t", 26, 256, 256, 1, 1),
    ("ConvBN_5", 13, 512, 512, 3, 1),
    ("neck", 13, 512, 256, 1, 1),
    ("h1", 13, 256, 512, 3, 1),
    ("head_13", 13, 512, 45, 1, 1),
    ("up", 13, 256, 128, 1, 1),
    ("ConvBN_9", 26, 384, 256, 3, 1),
    ("head_26", 26, 256, 45, 1, 1),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from bench import readback

    b = args.batch
    total_macs = 0.0
    total_t = 0.0
    rows = []
    for name, h, cin, cout, k, s in LAYERS:
        ho = h // s
        x = jax.random.normal(jax.random.PRNGKey(0), (b, h, h, cin),
                              jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (k, k, cin, cout),
                              jnp.bfloat16)

        @jax.jit
        def run(x, w, s=s):
            def body(acc, _):
                y = jax.lax.conv_general_dilated(
                    x + acc.astype(jnp.bfloat16), w,
                    window_strides=(s, s), padding="SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                y = jax.nn.leaky_relu(y, 0.1)
                return jnp.sum(y[0, 0, 0]).astype(jnp.float32), ()
            acc, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(args.iters))
            return acc

        out = run(x, w)
        _ = readback(out)
        # Measure the fixed readback latency for THIS warm executable and
        # subtract it: through the axon tunnel a scalar readback costs
        # ~30 ms, which otherwise adds ~1 ms/iter at 32 iters — more than
        # the true time of every small layer (the first version of this
        # tool made exactly that mistake; docs/PERF.md numbers postdate
        # the fix).
        lat = []
        for _ in range(3):
            t = time.perf_counter()
            _ = readback(out)
            lat.append(time.perf_counter() - t)
        sync = min(lat)
        t0 = time.perf_counter()
        out = run(x, w)
        _ = readback(out)
        dt = max(time.perf_counter() - t0 - sync, 1e-9) / args.iters
        macs = b * ho * ho * cout * cin * k * k
        tfs = 2 * macs / dt / 1e12
        total_macs += macs
        total_t += dt
        rows.append((name, h, cin, cout, k, s, dt * 1e3, tfs))

    peak = 197.0  # v5e bf16 TF/s
    print(f"{'layer':10s} {'H':>4s} {'Cin':>4s} {'Cout':>4s} k s "
          f"{'ms':>8s} {'TF/s':>7s} {'%peak':>6s}")
    for name, h, cin, cout, k, s, ms, tfs in rows:
        print(f"{name:10s} {h:4d} {cin:4d} {cout:4d} {k} {s} "
              f"{ms:8.3f} {tfs:7.1f} {100 * tfs / peak:5.1f}%")
    agg = 2 * total_macs / total_t / 1e12
    print(f"\nTOTAL (sum of isolated layers): {total_t * 1e3:.3f} ms/batch"
          f" ({total_t * 1e3 / args.batch:.4f} ms/frame), "
          f"{agg:.1f} TF/s = {100 * agg / peak:.1f}% of bf16 peak")


if __name__ == "__main__":
    main()
