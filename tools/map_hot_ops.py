"""Map profiled HLO fusion names -> source metadata (op_name/source).

Compiles the same fleet chunk as tools/profile_step.py, dumps the
optimized HLO text, and prints the metadata of the named ops (the hot
entries from a profile_step run), so "fusion.814" becomes a
file:line in the pipeline.

Usage: python tools/map_hot_ops.py [--rigs 64] [--knn xla] \
            fusion.814 compare_select_fusion.87 ...
"""

from __future__ import annotations

import argparse
import functools
import re
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rigs", type=int, default=64)
    ap.add_argument("--scan", type=int, default=4)
    ap.add_argument("--knn", default="xla")
    ap.add_argument("--stem", default="pallas")
    ap.add_argument("ops", nargs="*", default=[])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from grid_vision_tpu import pipeline
    from grid_vision_tpu.config import GridVisionConfig
    from grid_vision_tpu.types import GridState
    from bench import (apply_perturbation, build_obs_pool,
                       draw_perturbations,
                       output_digest)

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
    lowered = chunk.lower(eng.params, states, pool, eng.extrinsics,
                          jax.random.PRNGKey(0))
    txt = lowered.compile().as_text()
    with open("/tmp/gv_chunk_hlo.txt", "w") as f:
        f.write(txt)
    print(f"optimized HLO: {len(txt)} bytes -> /tmp/gv_chunk_hlo.txt")

    for name in args.ops:
        # find the fusion's root definition line and its metadata
        pat = re.compile(rf"%?{re.escape(name)}(\.clone)?\s*=")
        hits = [ln for ln in txt.splitlines() if pat.search(ln)]
        print(f"\n=== {name}: {len(hits)} definition line(s)")
        for ln in hits[:4]:
            m = re.search(r'metadata={([^}]*)}', ln)
            print("  " + (m.group(1)[:300] if m else ln.strip()[:300]))


if __name__ == "__main__":
    main()
