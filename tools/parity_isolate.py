"""Isolate WHICH production-config axis drives the vision-mode e2e gap.

Round-4 verdict: production (bf16 + fleet orientation budget + pallas
stem + max_static_depth=16) vs compat (f32 exact vmap(step)) agrees
only 98.59% mean / 97.53% min in vision mode — under the 99% bar and
6x the engine's own input-noise floor, so it has a cause. But the
production config differs from compat along FOUR axes at once. This
tool re-runs the production-vs-compat comparison flipping ONE axis at a
time, so the gap gets a mechanism instead of a shrug:

    axis            production        compat          isolated by
    compute dtype   bfloat16          float32         cfg.compute_dtype
    orient batch    fleet budget=5/r  per-rig Q7      orientation_budget
    detector stem   pallas (tpu)      xla             stem backend
    static kNN      compacted (16)    full capacity   max_static_depth

Reference criterion: BASELINE.json north_star;
/root/reference/src/occupancy_grid.cpp:16-31 (the grid update being
agreed on). Usage:
    python tools/parity_isolate.py --cpu --rigs 8 --chunks 2 --scan 6
    python tools/parity_isolate.py --rigs 32            # hardware
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def make_chunk(cfg, budget, jax):
    from bench import apply_perturbation
    from grid_vision_tpu import pipeline

    step = functools.partial(pipeline.fleet_step, cfg=cfg,
                             orientation_budget=budget)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def chunk(params, states, pool, extr, bright_t, jitter_t):
        def body(s, bj):
            obs_t = apply_perturbation(pool, bj[0], bj[1])
            s2, out = step(params, s, obs_t, extr)
            return s2, out.occupancy_i8

        return jax.lax.scan(body, states, (bright_t, jitter_t))

    return chunk


def run_variant(name, cfg_kwargs, budget, args, jax, jnp, pool32):
    """Agreement of ONE variant engine vs the compat-f32 exact chain."""
    from bench import draw_perturbations
    from grid_vision_tpu import pipeline
    from grid_vision_tpu.config import GridVisionConfig
    from grid_vision_tpu.types import GridState, Obs

    common = dict(
        max_points=8192, use_vision_orientation=True,
        detection_weights_file="weights/detector.npz",
        vision_weights_file="weights/orientation.npz")
    var_cfg = GridVisionConfig(**common, **cfg_kwargs)
    compat_cfg = GridVisionConfig(compute_dtype="float32", **common)
    var = pipeline.Engine(var_cfg, seed=0)
    compat = pipeline.Engine(compat_cfg, seed=0)

    pool_var = pool32
    if var_cfg.compute_dtype == "bfloat16":
        pool_var = Obs(image=pool32.image.astype(jnp.bfloat16),
                       cloud=pool32.cloud, has_image=pool32.has_image,
                       has_cloud=pool32.has_cloud)

    chunk_v = make_chunk(var.cfg, budget, jax)
    chunk_c = make_chunk(compat.cfg, None, jax)
    s_v = GridState.create_batch(var.cfg, args.rigs)
    s_c = GridState.create_batch(compat.cfg, args.rigs)
    key = jax.random.PRNGKey(args.seed)
    agreements = []
    t0 = time.perf_counter()
    for ci in range(args.chunks):
        key, sub = jax.random.split(key)
        bright_t, jitter_t = draw_perturbations(sub, args.scan, args.rigs)
        s_v, occ_v = chunk_v(var.params, s_v, pool_var, var.extrinsics,
                             bright_t, jitter_t)
        s_c, occ_c = chunk_c(compat.params, s_c, pool32,
                             compat.extrinsics, bright_t, jitter_t)
        a = np.asarray(occ_v, np.int32)
        b = np.asarray(occ_c, np.int32)
        agreements.append((np.abs(a - b) <= 1).mean(axis=(2, 3)))
    agree = np.concatenate(agreements, axis=0)
    res = {
        "variant": name,
        "per_step_min": float(agree.min()),
        "per_step_mean": float(agree.mean()),
        "final_grid_min": float(agree[-1].min()),
        "final_grid_mean": float(agree[-1].mean()),
    }
    print(f"[{name:28s}] mean {agree.mean() * 100:.3f}%  "
          f"min {agree.min() * 100:.3f}%  "
          f"final-mean {agree[-1].mean() * 100:.3f}%  "
          f"({time.perf_counter() - t0:.0f}s)", flush=True)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rigs", type=int, default=8)
    ap.add_argument("--chunks", type=int, default=2)
    ap.add_argument("--scan", type=int, default=6)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--variants", default="all",
                    help="comma list or 'all'")
    ap.add_argument("--out", default="PARITY_ISOLATE.json")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bench import build_obs_pool
    from grid_vision_tpu.config import GridVisionConfig

    pool32 = build_obs_pool(
        GridVisionConfig(max_points=8192, use_vision_orientation=True),
        args.rigs)

    stem = "xla" if args.cpu else "pallas"
    B = 5 * args.rigs       # the production budget is 5 PER RIG
    # each variant flips ONE axis away from compat (except 'production',
    # which flips all of them = the round-4 measured configuration).
    # NOTE the budget axis measured ZERO dropped boxes on the bench
    # scenes (mean dynamic load 3.1/rig, max 6, budget fleet-pooled) —
    # it is a numeric-path axis here (compacted single net batch vs
    # per-rig vmap), not a coverage axis.
    VARIANTS = {
        "production": (dict(compute_dtype="bfloat16",
                            detector_stem_backend=stem,
                            orientation_stem_backend=stem,
                            max_static_depth=16), B),
        "bf16_only": (dict(compute_dtype="bfloat16"), None),
        "budget_only": (dict(), B),
        "static16_only": (dict(max_static_depth=16), None),
        "stem_only": (dict(detector_stem_backend=stem), None),
        "orient_stem_only": (dict(orientation_stem_backend=stem), B),
        # combination probes: production minus one axis
        "production_minus_bf16": (dict(detector_stem_backend=stem,
                                       orientation_stem_backend=stem,
                                       max_static_depth=16), B),
        "production_minus_budget": (dict(compute_dtype="bfloat16",
                                         detector_stem_backend=stem,
                                         max_static_depth=16), None),
    }
    names = (list(VARIANTS) if args.variants == "all"
             else args.variants.split(","))
    report = {"rigs": args.rigs, "chunks": args.chunks, "scan": args.scan,
              "backend": jax.devices()[0].platform, "results": []}
    for n in names:
        kw, budget = VARIANTS[n]
        report["results"].append(
            run_variant(n, kw, budget, args, jax, jnp, pool32))
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
