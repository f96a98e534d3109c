"""Interleaved A/B of the crop-standardization normalize dtype on the
suite's config-5 shape (64-rig exact fleet step).

Variant A ("bf16"): the shipped fast path — per-crop stats in f32, the
subtract/multiply in the crop dtype (ops/preprocess._standardize).
Variant B ("f32"): the round-2 form — normalize arithmetic in f32 and a
convert back to bf16 for the net (copy.794 in the round-3 device
profile, ~7.2 us/frame at these shapes).

The toggle is preprocess._NORM_IN_F32, read at TRACE time: each variant
gets its own jit wrapper and is compiled while the flag holds its
value. Same pairwise median-of-windows hygiene as tools/bench_stem_ab.py
(the tunnel drifts 3-20x over tens of seconds, so the variants
alternate timed groups in one process against one obs pool).

Usage: python tools/bench_std_ab.py [--rigs 64] [--groups 6]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rigs", type=int, default=64)
    ap.add_argument("--scan", type=int, default=8)
    ap.add_argument("--groups", type=int, default=6)
    ap.add_argument("--calls", type=int, default=6)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from grid_vision_tpu import pipeline
    from grid_vision_tpu.config import GridVisionConfig
    from grid_vision_tpu.ops import preprocess
    from grid_vision_tpu.types import GridState, Obs
    from bench import (apply_perturbation, draw_perturbations, readback,
                       synth_obs,
                       output_digest)

    cfg = GridVisionConfig(max_points=8192, compute_dtype="bfloat16")
    eng = pipeline.Engine(cfg, seed=0)

    keys = jax.random.split(jax.random.PRNGKey(0), args.rigs)
    obs_b = jax.jit(jax.vmap(functools.partial(synth_obs, cfg=cfg)))(
        keys)
    obs_b = Obs(image=obs_b.image.astype(jnp.bfloat16),
                cloud=obs_b.cloud, has_image=obs_b.has_image,
                has_cloud=obs_b.has_cloud)

    def make_chunk():
        budget = 5 * args.rigs
        fstep = functools.partial(pipeline.fleet_step, cfg=cfg,
                                  orientation_budget=budget)

        @functools.partial(jax.jit, donate_argnums=(1,))
        def fleet_chunk(params, states, obs, extr, key):
            key, sub = jax.random.split(key)
            br, ji = draw_perturbations(sub, args.scan, args.rigs)

            def body(carry, bj):
                s, acc = carry
                o = apply_perturbation(obs, bj[0], bj[1])
                s2, out = fstep(params, s, o, extr)
                # outputs stay live (bench.output_digest): measure the
                # program production runs, not a dead-coded subset
                return (s2, acc + output_digest(out)), ()

            (states, acc), _ = jax.lax.scan(
                body, (states, jnp.zeros((), jnp.float32)), (br, ji))
            return states, acc, key

        return fleet_chunk

    run = {}
    for name, in_f32 in (("bf16", False), ("f32", True)):
        preprocess._NORM_IN_F32 = in_f32
        chunk = make_chunk()  # fresh jit wrapper per variant
        states = GridState.create_batch(cfg, args.rigs)
        holder = {"s": states, "k": jax.device_put(jax.random.PRNGKey(3))}

        def runner(holder=holder, chunk=chunk):
            holder["s"], acc, holder["k"] = chunk(
                eng.params, holder["s"], obs_b, eng.extrinsics,
                holder["k"])
            return acc

        t0 = time.perf_counter()
        _ = readback(runner())  # compile (flag read at trace time)
        log(f"[{name}] compile+settle {time.perf_counter() - t0:.1f}s")
        run[name] = runner
    preprocess._NORM_IN_F32 = False

    _ = readback(run["bf16"]())
    t = time.perf_counter()
    _ = readback(run["bf16"]())
    sync = time.perf_counter() - t

    rates = {n: [] for n in run}
    for g in range(args.groups):
        for name in run:
            t0 = time.perf_counter()
            for _ in range(args.calls):
                out = run[name]()
            _ = readback(out)
            dt = time.perf_counter() - t0 - sync
            if dt > 0:
                fps = args.rigs * args.scan * args.calls / dt
                rates[name].append(fps)
                log(f"group {g} {name:5s} {fps:8.0f} fused fps")
    for name, rs in rates.items():
        if not rs:
            print(f"{name}: no valid windows (every dt <= sync)")
            continue
        med = float(np.median(rs))
        print(f"{name}: median {med:.0f} fused fps over {len(rs)} "
              f"windows (min {min(rs):.0f} max {max(rs):.0f})")


if __name__ == "__main__":
    main()
