"""Interleaved A/B of the detector s2d stem on the suite's config 5.

The tunnel to the chip drifts 3-20x over tens of seconds (CLAUDE.md), so
sequential A-then-B runs confound the variant with the tunnel state.
This interleaves timed groups A,B,A,B,... in ONE process against the
same obs pool, and reports the per-variant median — the same
median-of-windows hygiene as bench_suite, applied pairwise.

Usage: python tools/bench_s2d_ab.py [--rigs 64] [--groups 6]
"""

from __future__ import annotations

import argparse
import dataclasses
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
    from grid_vision_tpu.types import GridState, Obs, PointCloud
    from bench import output_digest, readback, synth_obs

    cfg_a = GridVisionConfig(max_points=8192, compute_dtype="bfloat16",
                             detector_s2d_stem=True)
    cfg_b = dataclasses.replace(cfg_a, detector_s2d_stem=False)
    eng = pipeline.Engine(cfg_a, seed=0)

    keys = jax.random.split(jax.random.PRNGKey(0), args.rigs)
    obs_b = jax.jit(jax.vmap(functools.partial(synth_obs, cfg=cfg_a)))(
        keys)
    obs_b = Obs(image=obs_b.image.astype(jnp.bfloat16),
                cloud=obs_b.cloud, has_image=obs_b.has_image,
                has_cloud=obs_b.has_cloud)

    def make_chunk(cfg):
        budget = 5 * args.rigs
        fstep = functools.partial(pipeline.fleet_step, cfg=cfg,
                                  orientation_budget=budget)

        @functools.partial(jax.jit, donate_argnums=(1,))
        def fleet_chunk(params, states, obs, extr, key):
            key, sub = jax.random.split(key)
            ks = jax.random.split(sub, args.scan)

            def body(s, kk):
                k1, k2 = jax.random.split(kk)
                ji = jax.random.uniform(k1, (), jnp.float32, -1, 1)
                jc = jax.random.uniform(k2, (), jnp.float32, -0.01, 0.01)
                o = Obs(image=obs.image + ji.astype(obs.image.dtype),
                        cloud=PointCloud(xyz=obs.cloud.xyz + jc,
                                         intensity=obs.cloud.intensity,
                                         count=obs.cloud.count),
                        has_image=obs.has_image, has_cloud=obs.has_cloud)
                s2, out = fstep(params, s, o, extr)
                return s2, output_digest(out)

            states, digs = jax.lax.scan(body, states, ks)
            return states, jnp.sum(digs), key

        return fleet_chunk

    variants = {"s2d": make_chunk(cfg_a), "ref3x3": make_chunk(cfg_b)}
    run = {}
    for name, chunk in variants.items():
        states = GridState.create_batch(cfg_a, args.rigs)
        holder = {"s": states, "k": jax.device_put(jax.random.PRNGKey(3))}

        def runner(holder=holder, chunk=chunk):
            holder["s"], acc, holder["k"] = chunk(
                eng.params, holder["s"], obs_b, eng.extrinsics,
                holder["k"])
            return acc

        t0 = time.perf_counter()
        _ = readback(runner())  # compile + settle
        log(f"[{name}] compile+settle {time.perf_counter() - t0:.1f}s")
        run[name] = runner

    _ = readback(run["s2d"]())
    t = time.perf_counter()
    _ = readback(run["s2d"]())
    sync = time.perf_counter() - t

    rates = {n: [] for n in variants}
    for g in range(args.groups):
        for name in variants:
            t0 = time.perf_counter()
            for _ in range(args.calls):
                out = run[name]()
            _ = readback(out)
            dt = time.perf_counter() - t0 - sync
            if dt > 0:
                fps = args.rigs * args.scan * args.calls / dt
                rates[name].append(fps)
                log(f"group {g} {name:7s} {fps:8.0f} fused fps")
    for name, rs in rates.items():
        med = float(np.median(rs)) if rs else float("nan")
        print(f"{name}: median {med:.0f} fused fps over {len(rs)} "
              f"windows (min {min(rs):.0f} max {max(rs):.0f})")


if __name__ == "__main__":
    main()
