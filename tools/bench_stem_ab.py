"""Interleaved A/B of the fused Pallas resize+stem kernel on the
suite's config-5 shape (64-rig exact fleet step).

Same pairwise median-of-windows hygiene as tools/bench_s2d_ab.py: the
tunnel drifts 3-20x over tens of seconds, so the variants alternate
timed groups in one process against one obs pool.

Usage: python tools/bench_stem_ab.py [--rigs 64] [--groups 6]
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
    ap.add_argument("--a", default="pallas",
                    help="detector_stem_backend of variant A")
    ap.add_argument("--b", default="xla",
                    help="detector_stem_backend of variant B")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from grid_vision_tpu import pipeline
    from grid_vision_tpu.config import GridVisionConfig
    from grid_vision_tpu.types import GridState, Obs
    from bench import (apply_perturbation, draw_perturbations, readback,
                       synth_obs,
                       output_digest)

    cfg_a = GridVisionConfig(max_points=8192, compute_dtype="bfloat16",
                             detector_stem_backend=args.a)
    cfg_b = dataclasses.replace(cfg_a, detector_stem_backend=args.b)
    eng = pipeline.Engine(cfg_a, seed=0)
    # fold the stem/CSP constants for BOTH variants regardless of which
    # backend cfg_a selects — otherwise the variant whose consts are
    # missing re-derives them in-graph inside the scan body (XLA does
    # not hoist that; see ops/pallas_stem.prepare_stem_constants) and
    # the A/B is silently biased against it
    from grid_vision_tpu.ops import pallas_csp, pallas_stem
    params = dict(eng.params)
    if "detector_stem" not in params:
        params["detector_stem"] = jax.device_put(
            pallas_stem.prepare_stem_constants(params["detector"]))
    if "detector_csp" not in params:
        params["detector_csp"] = jax.device_put(
            pallas_csp.prepare_csp_constants(params["detector"]))
    if "detector_csp_flat" not in params:
        params["detector_csp_flat"] = jax.device_put(
            pallas_csp.prepare_csp_flat_constants(params["detector"]))
    eng.params = params

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

    variants = {args.a: make_chunk(cfg_a), args.b: make_chunk(cfg_b)}
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

    _ = readback(run[args.a]())
    t = time.perf_counter()
    _ = readback(run[args.a]())
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
