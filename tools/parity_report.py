"""Grid-agreement parity report: engine vs the NumPy oracle chain.

Covers BOTH dynamic-object modes (the round-1 report was PCA-only):

  - PCA mode (use_vision_orientation=false): N randomized synthetic
    scenes through the full fused pipeline vs the literal NumPy
    transcription of the reference math (RANSAC ground removal ->
    box-frustum association -> outlier removal -> PCA L-shape -> grid).
  - Vision mode (use_vision_orientation=true, the reference default,
    config/grid_vision_cfg.yaml:24): the orientation NET has no
    recoverable reference (the TRT engine is stripped), so identical
    randomized net outputs are injected into both chains and everything
    downstream is compared — MultiBin alpha/theta/dims/64-combo solve
    (vision_orientation.cpp:241-510) -> camera->base transform ->
    L-shape rasterization.

Reports the BASELINE criterion: % of int8 occupancy cells that agree
within one step, per scenario and aggregate, per mode.

Usage: python tools/parity_report.py [--scenarios 20] [--steps 5]
                                     [--mode pca|vision|both]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys

import numpy as np

sys.path.insert(0, ".")

DYNAMIC_LABELS = (0, 1, 2, 9)
STATIC_LABELS = (4, 5, 6)


def _harness_config(args, **overrides):
    """compat (default) or the PRODUCTION config's field values.

    --config production sets the fields the shipped bench.py config
    changes (compute_dtype=bfloat16, max_static_depth=16,
    orientation_compute) so the oracle harness grades the production
    engine's downstream math, not just the compat one. The harness
    injects net outputs (see module docstring), so the conv stacks
    themselves are out of scope here — tools/parity_production.py is
    the end-to-end (real detector, both precisions) companion."""
    from grid_vision_tpu.config import GridVisionConfig

    if args.config == "production":
        overrides.update(compute_dtype="bfloat16", max_static_depth=16,
                         orientation_compute="float32")
    else:
        overrides.update(compute_dtype="float32")
    return GridVisionConfig(**overrides)


def run_pca(args, jax, jnp):
    from grid_vision_tpu import GridState, pipeline
    from grid_vision_tpu.types import Obs, PointCloud
    from tests.oracle import reference_oracle as oracle
    from tests.test_pipeline import (EXTR, R_CB, make_boxes, project_bbox,
                                     synthetic_scene)

    cfg = _harness_config(args, use_vision_orientation=False,
                          max_points=4096)
    fuse = jax.jit(functools.partial(pipeline.fuse, cfg=cfg))

    rng_master = np.random.default_rng(args.seed)
    agreements, exact = [], []
    for s in range(args.scenarios):
        rng = np.random.default_rng(rng_master.integers(2**31))
        state = GridState.create(cfg)
        g = oracle.GridOracle()
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
        agreements.append(float((np.abs(got - ref) <= 1).mean()))
        exact.append(float((got == ref).mean()))
        print(f"[pca] scenario {s}: within-one-step "
              f"{agreements[-1] * 100:.3f}%  exact {exact[-1] * 100:.3f}%",
              flush=True)
    return agreements, exact


def run_vision(args, jax, jnp):
    from grid_vision_tpu import GridState, pipeline
    from grid_vision_tpu.ops import multibin
    from grid_vision_tpu.geometry import intrinsic_matrix
    from grid_vision_tpu.types import Obs, PointCloud
    from tests.oracle import reference_oracle as oracle
    from tests.test_pipeline import EXTR, R_CB, make_boxes

    cfg = _harness_config(args, use_vision_orientation=True,
                          max_points=256)
    cap = cfg.max_orientation_batch
    K = intrinsic_matrix(cfg.fx, cfg.fy, cfg.cx, cfg.cy)
    proj = np.concatenate([np.asarray(K), np.zeros((3, 1))], axis=1)

    def engine_step(state, boxes, orient, conf_o, dims):
        dyn_boxes, _ = pipeline._compact_dynamic(boxes, cap)
        poses_cam = multibin.multibin_poses(orient, conf_o, dims,
                                            dyn_boxes, K, cfg)
        obs = Obs(image=jnp.zeros((480, 640, 3)),
                  cloud=PointCloud.empty(cfg.max_points),
                  has_image=jnp.asarray(True),
                  has_cloud=jnp.asarray(False))
        return pipeline.fuse({}, state, obs, boxes, EXTR, cfg, poses_cam)

    step = jax.jit(engine_step)

    rng_master = np.random.default_rng(args.seed + 1)
    agreements, exact = [], []
    for s in range(args.scenarios):
        rng = np.random.default_rng(rng_master.integers(2**31))
        state = GridState.create(cfg)
        g = oracle.GridOracle()
        for t in range(args.steps):
            # randomized detections, confidence-descending (post-NMS order)
            n_dyn = int(rng.integers(1, 6))
            n_static = int(rng.integers(0, 3))
            labels = ([int(rng.choice(DYNAMIC_LABELS))
                       for _ in range(n_dyn)]
                      + [int(rng.choice(STATIC_LABELS))
                         for _ in range(n_static)])
            rng.shuffle(labels)
            entries = []
            for i, lab in enumerate(labels):
                x0 = float(rng.uniform(40, 480))
                y0 = float(rng.uniform(120, 320))
                entries.append({
                    "x_min": x0, "y_min": y0,
                    "x_max": x0 + float(rng.uniform(40, 150)),
                    "y_max": y0 + float(rng.uniform(40, 130)),
                    "label": lab,
                    "confidence": 0.95 - 0.04 * i,
                })
            boxes = make_boxes(entries, cfg.max_detections)

            # identical randomized net outputs into both chains
            orient = rng.normal(size=(cap, 2, 2)).astype(np.float32)
            conf_o = rng.normal(size=(cap, 2)).astype(np.float32)
            dims = (rng.normal(size=(cap, 3)) *
                    np.array([0.15, 0.15, 0.4])).astype(np.float32)

            state, out = step(state, boxes, jnp.asarray(orient),
                              jnp.asarray(conf_o), jnp.asarray(dims))

            # oracle: same dynamic compaction (first `cap` dynamic boxes
            # in confidence order == entry order), same outputs
            dyn_entries = [e for e in entries
                           if e["label"] in DYNAMIC_LABELS][:cap]
            poses = oracle.post_process(
                orient[:len(dyn_entries)], conf_o, dims, dyn_entries,
                proj, cfg.camera_image_width)
            lposes = []
            for p in poses:
                base = R_CB @ np.array([p["px"], p["py"], p["pz"]])
                lposes.append({"px": base[0], "py": base[1],
                               "length": p["length"],
                               "width": p["width"]})
            g.update_lshape(lposes)

        got = np.asarray(out.occupancy_i8).astype(np.int32)
        ref = g.export_i8().astype(np.int32)
        agreements.append(float((np.abs(got - ref) <= 1).mean()))
        exact.append(float((got == ref).mean()))
        print(f"[vision] scenario {s}: within-one-step "
              f"{agreements[-1] * 100:.3f}%  exact {exact[-1] * 100:.3f}%",
              flush=True)
    return agreements, exact


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenarios", type=int, default=10)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--mode", choices=("pca", "vision", "both"),
                    default="both")
    ap.add_argument("--config", choices=("compat", "production"),
                    default="compat",
                    help="engine config the oracle grades: compat "
                         "(f32 exact) or the shipped production "
                         "field values (see _harness_config)")
    ap.add_argument("--device", action="store_true",
                    help="run on the default backend (TPU) instead of "
                         "pinning CPU — the hardware PARITY evidence")
    args = ap.parse_args()

    import jax
    if not args.device:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    report = {
        "criterion": "int8 occupancy agreement within one step",
        "scenarios": args.scenarios,
        "steps_per_scenario": args.steps,
        "config": args.config,
        "backend": None,   # filled below
    }
    report["backend"] = jax.devices()[0].platform
    ok = True
    for mode, runner in (("pca", run_pca), ("vision", run_vision)):
        if args.mode not in (mode, "both"):
            continue
        agreements, exact = runner(args, jax, jnp)
        report[mode] = {
            "min_agreement": min(agreements),
            "mean_agreement": float(np.mean(agreements)),
            "mean_exact": float(np.mean(exact)),
            "passes_99pct": all(a >= 0.99 for a in agreements),
        }
        ok = ok and report[mode]["passes_99pct"]
    report["passes_99pct"] = ok
    print(json.dumps(report))


if __name__ == "__main__":
    main()
