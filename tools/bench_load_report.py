"""Report the bench scene pool's dynamic-detection load per rig.

Justifies bench.py's fleet orientation budget: prints the per-rig count
of valid dynamic boxes (after the per-rig Q7 clamp to
max_orientation_batch) over the exact pool bench.py uses, so the chosen
budget can be checked against the real load (drops should be ~0).

Usage: python tools/bench_load_report.py [--rigs 64] [--cpu]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rigs", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from grid_vision_tpu import pipeline
    from grid_vision_tpu.config import GridVisionConfig
    from grid_vision_tpu.taxonomy import is_dynamic

    cfg = GridVisionConfig(max_points=8192, compute_dtype="bfloat16",
                           detection_weights_file="weights/detector.npz",
                           vision_weights_file="weights/orientation.npz")
    eng = pipeline.Engine(cfg, seed=0)
    pool = bench.build_obs_pool(cfg, args.rigs)

    @jax.jit
    def count(params, images):
        boxes, _ = pipeline.detect_batch(params, images, cfg)
        dyn = boxes.valid & is_dynamic(boxes.label)
        return jnp.minimum(jnp.sum(dyn, axis=-1), cfg.max_orientation_batch)

    per_rig = np.asarray(count(eng.params, pool.image))
    print(f"rigs={args.rigs}  total={per_rig.sum()}  "
          f"mean={per_rig.mean():.2f}/rig  max={per_rig.max()}  "
          f"hist={np.bincount(per_rig, minlength=9).tolist()}")
    for mult in (2, 3, 4, 5, 6, 8):
        budget = mult * args.rigs
        dropped = max(0, int(per_rig.sum()) - budget)
        print(f"  budget {mult}/rig ({budget}): dropped {dropped}")


if __name__ == "__main__":
    main()
