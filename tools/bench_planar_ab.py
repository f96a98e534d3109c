"""Interleaved A/B of the image-pool layout on the suite's config-5
shape (64-rig exact fleet step).

Variant "planar": the pool stored channel-first (R, 3, H, W) — the
Pallas detector stem consumes it with NO per-step HWC->planar transpose
(fusion.759 in the round-3 device profile, ~8 us/frame of pure HBM
copy at these shapes); the orientation crop einsums take the planar
operand order (ops/preprocess.crop_resize).
Variant "hwc": the round-3 default (R, H, W, 3) pool.

Both variants run the SAME fleet_step code — layout is auto-detected
from the obs shape — so this is one jit wrapper compiled twice by input
shape. Same pairwise median-of-windows hygiene as tools/bench_stem_ab.py.

Usage: python tools/bench_planar_ab.py [--rigs 64] [--groups 8]
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
    ap.add_argument("--groups", type=int, default=8)
    ap.add_argument("--calls", type=int, default=6)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from grid_vision_tpu import pipeline
    from grid_vision_tpu.config import GridVisionConfig
    from grid_vision_tpu.types import GridState, Obs
    from bench import (apply_perturbation, build_obs_pool,
                       draw_perturbations, readback,
                       output_digest)

    cfg = GridVisionConfig(max_points=8192, compute_dtype="bfloat16")
    eng = pipeline.Engine(cfg, seed=0)

    pool_hwc = build_obs_pool(cfg, args.rigs, image_dtype=jnp.bfloat16)
    pool_pl = Obs(image=jnp.transpose(pool_hwc.image, (0, 3, 1, 2)),
                  cloud=pool_hwc.cloud, has_image=pool_hwc.has_image,
                  has_cloud=pool_hwc.has_cloud)
    pools = {"hwc": jax.device_put(pool_hwc),
             "planar": jax.device_put(pool_pl)}

    budget = 5 * args.rigs
    fstep = functools.partial(pipeline.fleet_step, cfg=cfg,
                              orientation_budget=budget)

    def make_chunk():
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
    for name, pool in pools.items():
        chunk = make_chunk()
        states = GridState.create_batch(cfg, args.rigs)
        holder = {"s": states, "k": jax.device_put(jax.random.PRNGKey(3))}

        def runner(holder=holder, chunk=chunk, pool=pool):
            holder["s"], acc, holder["k"] = chunk(
                eng.params, holder["s"], pool, eng.extrinsics,
                holder["k"])
            return acc

        t0 = time.perf_counter()
        _ = readback(runner())
        log(f"[{name}] compile+settle {time.perf_counter() - t0:.1f}s")
        run[name] = runner

    _ = readback(run["hwc"]())
    t = time.perf_counter()
    _ = readback(run["hwc"]())
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
                log(f"group {g} {name:7s} {fps:8.0f} fused fps")
    for name, rs in rates.items():
        if not rs:
            print(f"{name}: no valid windows (every dt <= sync)")
            continue
        med = float(np.median(rs))
        print(f"{name}: median {med:.0f} fused fps over {len(rs)} "
              f"windows (min {min(rs):.0f} max {max(rs):.0f})")


if __name__ == "__main__":
    main()
