"""Device-time profile of the fused pipeline: jax.profiler + trace parse.

Produces a ranked table of XLA op fusions by device time for one fleet
chunk (the profiler works through the axon tunnel; traces land under
--out as xplane + chrome-trace). Use to find the next hot op after
tools/perf_ablate.py localizes the hot *stage*.

Usage: python tools/profile_step.py [--rigs 64] [--scan 4]
"""

from __future__ import annotations

import argparse
import collections
import functools
import glob
import gzip
import json
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rigs", type=int, default=64)
    ap.add_argument("--scan", type=int, default=4)
    ap.add_argument("--out", default="/tmp/gv_trace")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--knn", default="approx",
                    help="knn_backend: approx (bench.py) | xla (suite "
                         "config 5, exact)")
    ap.add_argument("--stem", default="pallas",
                    help="detector_stem_backend (bench default: pallas)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from grid_vision_tpu import pipeline
    from grid_vision_tpu.config import GridVisionConfig
    from grid_vision_tpu.types import GridState
    from bench import (apply_perturbation, build_obs_pool,
                       draw_perturbations, readback,
                       output_digest)

    # Mirror bench.py's flagship configuration exactly.
    cfg = GridVisionConfig(max_points=8192, compute_dtype="bfloat16",
                           knn_backend=args.knn,
                           detector_stem_backend=args.stem,
                           detection_weights_file="weights/detector.npz",
                           vision_weights_file="weights/orientation.npz")
    eng = pipeline.Engine(cfg, seed=0)
    pool = build_obs_pool(cfg, args.rigs)
    budget = 5 * args.rigs

    @functools.partial(jax.jit, donate_argnums=(1,))
    def chunk(params, states, pool, extr, key):
        bright_t, jitter_t = draw_perturbations(key, args.scan,
                                                args.rigs)

        def body(carry, bj):
            s, acc = carry
            obs = apply_perturbation(pool, bj[0], bj[1])
            s2, out = pipeline.fleet_step(params, s, obs, extr, cfg,
                                          orientation_budget=budget)
            # outputs stay live (bench.output_digest): profile the
            # program production runs, not a dead-coded subset
            return (s2, acc + output_digest(out)), ()
        (states, acc), _ = jax.lax.scan(
            body, (states, jnp.zeros((), jnp.float32)),
            (bright_t, jitter_t))
        return states, acc

    states = GridState.create_batch(cfg, args.rigs)
    states, acc = chunk(eng.params, states, pool, eng.extrinsics,
                        jax.random.PRNGKey(0))
    _ = readback(acc)   # compile + settle outside the trace

    jax.profiler.start_trace(args.out)
    states, acc = chunk(eng.params, states, pool, eng.extrinsics,
                        jax.random.PRNGKey(1))
    _ = readback(acc)
    jax.profiler.stop_trace()

    f = sorted(glob.glob(f"{args.out}/**/*.trace.json.gz",
                         recursive=True))[-1]
    with gzip.open(f) as fh:
        trace = json.load(fh)
    durs = collections.Counter()
    for ev in trace.get("traceEvents", []):
        # keep device-side complete events; drop python host frames
        if (ev.get("ph") == "X" and "dur" in ev
                and not ev.get("name", "").startswith("$")
                and "asarray" not in ev.get("name", "")):
            durs[ev["name"]] += ev["dur"]
    frames = args.rigs * args.scan
    print(f"frames: {frames}; top ops by device time:")
    for name, d in durs.most_common(args.top):
        print(f"{d / 1e3:9.2f} ms  {d / frames:7.1f} us/frame  {name[:90]}")
    print(f"trace: {f}")


if __name__ == "__main__":
    main()
