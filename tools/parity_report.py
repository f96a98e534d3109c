"""Grid-agreement parity report: engine vs the NumPy oracle chain.

Runs N randomized synthetic scenarios through the full fused PCA-mode
pipeline and through the literal NumPy transcription of the reference
math, and reports the BASELINE criterion: % of int8 occupancy cells that
agree within one step, per scenario and aggregate.

Usage: python tools/parity_report.py [--scenarios 20] [--steps 5]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenarios", type=int, default=10)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from grid_vision_tpu import pipeline
    from grid_vision_tpu.config import GridVisionConfig
    from grid_vision_tpu.types import Boxes, Obs, PointCloud
    from tests.oracle import reference_oracle as oracle
    from tests.test_pipeline import (EXTR, R_CB, make_boxes, project_bbox,
                                     synthetic_scene)

    cfg = GridVisionConfig(use_vision_orientation=False, max_points=4096,
                           compute_dtype="float32")
    fuse = jax.jit(functools.partial(pipeline.fuse, cfg=cfg))

    rng_master = np.random.default_rng(args.seed)
    agreements = []
    exact = []
    for s in range(args.scenarios):
        from grid_vision_tpu import GridState
        rng = np.random.default_rng(rng_master.integers(2**31))
        state = GridState.create(cfg)
        g = oracle.GridOracle()
        agree = None
        for t in range(args.steps):
            xyz, car = synthetic_scene(rng)
            cloud = PointCloud.from_numpy(xyz, None, cfg.max_points)
            bbox = project_bbox(car)
            bbox["label"] = 9
            boxes = make_boxes([bbox], cfg.max_detections)
            obs = Obs(image=jnp.zeros((480, 640, 3)), cloud=cloud,
                      has_image=jnp.asarray(True),
                      has_cloud=jnp.asarray(True))
            state, out = fuse({}, state, obs, boxes, EXTR)

            # oracle chain (ideal RANSAC: the plane is synthetic-clean)
            # NOTE: PointCloud.from_numpy stride-subsamples on overflow;
            # mirror that so both sides see the same points.
            n_valid = int(cloud.count)
            xyz_eff = np.asarray(cloud.xyz[:n_valid])
            non_ground = xyz_eff[np.abs(xyz_eff[:, 1] - 1.8) > 0.05]
            K_np = np.array([[320.0, 0, 320.0], [0, 320.0, 240.0],
                             [0, 0, 1]], np.float32)
            clouds = oracle.extract_cloud_per_bbox(non_ground, K_np,
                                                   [bbox], 640, 480)
            filt = oracle.radius_outlier_removal(clouds[0], 0.4, 10)
            pose = oracle.pca_lshape(filt)
            poses = []
            if pose is not None:
                cam = np.array([pose["px"], pose["py"], pose["pz"]])
                base = R_CB @ cam
                poses.append({"px": base[0], "py": base[1],
                              "length": pose["length"],
                              "width": pose["width"]})
            g.update_lshape(poses)

        got = np.asarray(out.occupancy_i8).astype(np.int32)
        ref = g.export_i8().astype(np.int32)
        agree = float((np.abs(got - ref) <= 1).mean())
        exact.append(float((got == ref).mean()))
        agreements.append(agree)
        print(f"scenario {s}: within-one-step {agree * 100:.3f}%  "
              f"exact {exact[-1] * 100:.3f}%", flush=True)

    print(json.dumps({
        "criterion": "int8 occupancy agreement within one step",
        "scenarios": args.scenarios,
        "steps_per_scenario": args.steps,
        "min_agreement": min(agreements),
        "mean_agreement": float(np.mean(agreements)),
        "mean_exact": float(np.mean(exact)),
        "passes_99pct": all(a >= 0.99 for a in agreements),
    }))


if __name__ == "__main__":
    main()
