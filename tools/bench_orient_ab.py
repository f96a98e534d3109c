"""Interleaved A/B of the fused Pallas orientation front end on the
suite's config-5 shape (64-rig exact fleet step, vision orientation).

Variant A runs ops/pallas_orient.py (crop + standardize + folded s2d
stem in one VMEM kernel per compacted crop, scalar-prefetch image
indexing); variant B runs the XLA chain (per-rig crop einsums over all
max_orientation_batch slots, compact, standardize, ConvBN_0). Both end
in the identical ladder + MultiBin, so the delta isolates the front
end. Same pairwise median-of-windows hygiene as tools/bench_stem_ab.py
— the tunnel drifts 3-20x over tens of seconds, so the variants
alternate timed groups in one process against one obs pool.

Usage: python tools/bench_orient_ab.py [--rigs 64] [--groups 6]
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
    ap.add_argument("--budget-per-rig", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from grid_vision_tpu import pipeline
    from grid_vision_tpu.config import GridVisionConfig
    from grid_vision_tpu.types import GridState, Obs
    from bench import (apply_perturbation, draw_perturbations, readback,
                       synth_obs, output_digest)

    cfg_a = GridVisionConfig(max_points=8192, compute_dtype="bfloat16",
                             detector_stem_backend="pallas",
                             max_static_depth=16,
                             orientation_stem_backend="pallas")
    cfg_b = dataclasses.replace(cfg_a, orientation_stem_backend="xla")
    eng = pipeline.Engine(cfg_a, seed=0)
    # Engine(cfg_a) folded the orientation consts; the XLA variant
    # ignores them, so both variants see identical params.
    assert "orientation_stem" in eng.params

    keys = jax.random.split(jax.random.PRNGKey(0), args.rigs)
    obs_b = jax.jit(jax.vmap(functools.partial(synth_obs, cfg=cfg_a)))(
        keys)
    obs_b = Obs(image=obs_b.image.astype(jnp.bfloat16),
                cloud=obs_b.cloud, has_image=obs_b.has_image,
                has_cloud=obs_b.has_cloud)

    def make_chunk(cfg):
        budget = args.budget_per_rig * args.rigs
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
                return (s2, acc + output_digest(out)), ()

            (states, acc), _ = jax.lax.scan(
                body, (states, jnp.zeros((), jnp.float32)), (br, ji))
            return states, acc, key

        return fleet_chunk

    variants = {"pallas": make_chunk(cfg_a), "xla": make_chunk(cfg_b)}
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

    _ = readback(run["pallas"]())
    t = time.perf_counter()
    _ = readback(run["pallas"]())
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
        if not rs:
            print(f"{name}: no valid windows (every dt <= sync)")
            continue
        med = float(np.median(rs))
        print(f"{name}: median {med:.0f} fused fps over {len(rs)} "
              f"windows (min {min(rs):.0f} max {max(rs):.0f})")


if __name__ == "__main__":
    main()
