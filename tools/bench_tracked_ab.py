"""Interleaved A/B: the per-rig tracker's marginal cost on the config-5
fleet chunk — split into (a) the tracker's own compute and (b) the cost
of keeping the kNN static branch LIVE.

Motivation: the untracked bench chunks discard StepOutput, so XLA is
free to dead-code-eliminate any work whose only consumer is StepOutput.
In vision-orientation compat mode the kNN-median static branch
(association.knn_median_depth -> pixel_to_3d -> static_points) feeds
ONLY StepOutput (quirk Q6: statics never touch the grid; refine off) —
the tracker consumes static_points and therefore resurrects it.

Variants (same obs pool, alternating timed groups in one process):
  plain            config-5 chunk (StepOutput discarded)
  knn_live         config-5 chunk + the per-step sum of static_points
                   returned as a scan output (kNN kept live, no tracker)
  tracked          full tracker in the scan (Fleet-tracked path)
  tracked_nostatic tracker fed a surrogate StepOutput with
                   static_points zeroed / static_boxes invalid (tracker
                   live, kNN dead): isolates the tracker's own compute

Usage: python tools/bench_tracked_ab.py [--rigs 64] [--groups 5]
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
    ap.add_argument("--groups", type=int, default=5)
    ap.add_argument("--calls", type=int, default=6)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from grid_vision_tpu import pipeline
    from grid_vision_tpu.config import GridVisionConfig
    from grid_vision_tpu.ops import tracking as trk
    from grid_vision_tpu.types import (GridState, Obs, StepOutput)
    from bench import (apply_perturbation, draw_perturbations, readback,
                       synth_obs)

    cfg = GridVisionConfig(max_points=8192, compute_dtype="bfloat16",
                           detector_stem_backend="pallas")
    eng = pipeline.Engine(cfg, seed=0)
    keys = jax.random.split(jax.random.PRNGKey(0), args.rigs)
    obs_b = jax.jit(jax.vmap(functools.partial(synth_obs, cfg=cfg)))(keys)
    obs_b = Obs(image=obs_b.image.astype(jnp.bfloat16),
                cloud=obs_b.cloud, has_image=obs_b.has_image,
                has_cloud=obs_b.has_cloud)

    budget = 5 * args.rigs
    fstep = functools.partial(pipeline.fleet_step, cfg=cfg,
                              orientation_budget=budget)
    tcfg = trk.TrackConfig()
    vupd = jax.vmap(functools.partial(trk.update_tracks, cfg=cfg,
                                      tcfg=tcfg), in_axes=(0, 0, None))

    def make_chunk(mode):
        @functools.partial(jax.jit, donate_argnums=(1,))
        def chunk(params, carry, obs, extr, key):
            key, sub = jax.random.split(key)
            br, ji = draw_perturbations(sub, args.scan, args.rigs)

            def body(c, bj):
                s, tr = c
                o = apply_perturbation(obs, bj[0], bj[1])
                s2, out = fstep(params, s, o, extr)
                aux = ()
                if mode == "knn_live":
                    aux = jnp.sum(out.static_points)
                elif mode == "tracked":
                    tr, _ = vupd(tr, out, 0.05)
                elif mode == "tracked_nostatic":
                    sb = out.static_boxes
                    out2 = StepOutput(
                        boxes=out.boxes, poses=out.poses,
                        static_points=jnp.zeros_like(out.static_points),
                        static_depths=jnp.full_like(out.static_depths,
                                                    -1.0),
                        static_boxes=sb.__class__(
                            xyxy=sb.xyxy, confidence=sb.confidence,
                            label=sb.label,
                            valid=jnp.zeros_like(sb.valid)),
                        occupancy_i8=out.occupancy_i8,
                        saturation=out.saturation)
                    tr, _ = vupd(tr, out2, 0.05)
                return (s2, tr), aux

            c, aux = jax.lax.scan(body, carry, (br, ji))
            return c, key, aux

        return chunk

    modes = ("plain", "knn_live", "tracked", "tracked_nostatic")
    run = {}
    for mode in modes:
        chunk = make_chunk(mode)
        tracks = jax.tree_util.tree_map(
            lambda x: jnp.stack([x] * args.rigs),
            trk.TrackState.create(tcfg))
        holder = {"c": (GridState.create_batch(cfg, args.rigs), tracks),
                  "k": jax.device_put(jax.random.PRNGKey(3))}

        def runner(holder=holder, chunk=chunk):
            holder["c"], holder["k"], _aux = chunk(
                eng.params, holder["c"], obs_b, eng.extrinsics,
                holder["k"])
            return holder["c"][0].log_odds

        t0 = time.perf_counter()
        _ = readback(runner())
        log(f"[{mode}] compile+settle {time.perf_counter() - t0:.1f}s")
        run[mode] = runner

    _ = readback(run["plain"]())
    t = time.perf_counter()
    _ = readback(run["plain"]())
    sync = time.perf_counter() - t

    rates = {n: [] for n in modes}
    for g in range(args.groups):
        for name in modes:
            t0 = time.perf_counter()
            for _ in range(args.calls):
                out = run[name]()
            _ = readback(out)
            dt = time.perf_counter() - t0 - sync
            if dt > 0:
                fps = args.rigs * args.scan * args.calls / dt
                rates[name].append(fps)
                log(f"group {g} {name:17s} {fps:8.0f} fused fps")
    for name, rs in rates.items():
        if not rs:
            print(f"{name}: no valid windows")
            continue
        med = float(np.median(rs))
        print(f"{name}: median {med:.0f} fused fps over {len(rs)} windows"
              f" (min {min(rs):.0f} max {max(rs):.0f})")


if __name__ == "__main__":
    main()
