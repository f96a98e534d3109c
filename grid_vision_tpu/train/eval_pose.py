"""3D pose-quality evaluation: localization error of dynamic objects
against scene ground truth, end-to-end through the production fuse path.

The reference's 3D pose quality (PCA L-shape or MultiBin + the 64-combo
Deep3DBox location solver, src/vision_orientation.cpp:294-447) was only
ever eyeballed in RViz. Here it is a number: run `pipeline.fuse` with
ground-truth 2D boxes injected (so the metric isolates the 3D stack
from detector quality), match each emitted pose to the nearest
ground-truth dynamic object in the base-frame ground plane, and report
position-error statistics.

With --det net the 2D boxes come from the trained detector instead, and
the number becomes the full-system localization error.

CLI: python -m grid_vision_tpu eval-pose [--mode pca|vision|both]
     [--frames N] [--det oracle|net] [--cpu]  — prints one JSON dict.
"""

from __future__ import annotations

import functools
import json
from typing import Dict, List

import numpy as np

from ..config import GridVisionConfig
from ..taxonomy import DYNAMIC_LUT


def _gt_base_centers(scene, t: float, extr) -> np.ndarray:
    """(G, 2) base-frame xy of dynamic GT objects visible at t."""
    cam_to_base = np.asarray(extr.camera_to_base)
    out = []
    for i, obj in enumerate(scene.objects):
        if not DYNAMIC_LUT[min(obj.label, 10)]:
            continue
        if scene.bbox_at(i, t) is None:
            continue
        c = obj.center + obj.velocity * t
        p = cam_to_base @ np.array([c[0], c[1], c[2], 1.0])
        out.append(p[:2])
    return np.asarray(out, np.float64).reshape(-1, 2)


def evaluate_poses(mode: str = "vision", n_frames: int = 32,
                   det: str = "oracle", seed: int = 3000,
                   cfg: GridVisionConfig | None = None,
                   refine: bool = False) -> Dict:
    import jax

    from .. import pipeline
    from ..demo import default_extrinsics, oracle_boxes
    from ..io.scene import SyntheticScene
    from ..runtime.stream import obs_from_scene

    import dataclasses
    base = cfg or GridVisionConfig()
    overrides = {"use_vision_orientation": mode == "vision"}
    if refine:
        overrides.update(compat=False, vision_depth_refine=True)
    if det == "net" and not base.detection_weights_file:
        # --det net without explicit weights would silently evaluate a
        # random-init detector (zero detections); default to the
        # shipped checkpoints
        overrides.update(detection_weights_file="weights/detector.npz")
    if mode == "vision" and not base.vision_weights_file:
        # the vision branch always runs the orientation net — without
        # this default the oracle-box mode silently scored a RANDOM-
        # INIT MultiBin net (round-3 finding: the shipped net measures
        # 0.41 m median with refine where the random one read 0.84 m)
        overrides.update(vision_weights_file="weights/orientation.npz")
    cfg = dataclasses.replace(base, **overrides)
    eng = pipeline.Engine(cfg, extrinsics=default_extrinsics(), seed=0)
    fuse = jax.jit(functools.partial(pipeline.fuse, cfg=cfg))

    rng = np.random.default_rng(seed)
    errors: List[float] = []
    n_gt = n_matched = n_pred = 0
    state = eng.init_state()
    for f in range(n_frames):
        scene = SyntheticScene(cfg, seed=seed + f)
        scene.add_default_traffic()
        for _ in range(int(rng.integers(0, 3))):
            scene.add_object(
                center=[rng.uniform(-5, 5), 1.2, rng.uniform(6, 35)],
                velocity=[rng.uniform(-1, 1), 0.0, rng.uniform(-2, 1)],
                size=(1.8, 1.4, 4.2), label=9)
        t = float(rng.uniform(0.0, 2.0))
        obs = obs_from_scene(scene, t, cfg)
        if det == "oracle":
            boxes = oracle_boxes(scene, t, cfg)
            state, out = fuse(eng.params, state, obs, boxes,
                              eng.extrinsics)
        else:
            state, out = eng(state, obs)
        poses = out.poses
        valid = np.asarray(poses.valid)
        pxy = np.asarray(poses.position)[:, :2][valid]
        gts = _gt_base_centers(scene, t, eng.extrinsics)
        n_gt += len(gts)
        n_pred += int(valid.sum())
        if len(gts) == 0 or len(pxy) == 0:
            continue
        d = np.linalg.norm(pxy[:, None, :] - gts[None, :, :], axis=-1)
        # greedy one-to-one nearest matching
        d = d.copy()
        while np.isfinite(d).any() and d.size:
            i, j = np.unravel_index(np.argmin(d), d.shape)
            if not np.isfinite(d[i, j]):
                break
            errors.append(float(d[i, j]))
            n_matched += 1
            d[i, :] = np.inf
            d[:, j] = np.inf
    errs = np.asarray(errors)
    return {
        "mode": mode, "det": det, "refine": refine, "frames": n_frames,
        "n_gt": n_gt, "n_pred": n_pred, "n_matched": n_matched,
        "pos_err_median_m": round(float(np.median(errs)), 3)
        if errs.size else None,
        "pos_err_mean_m": round(float(errs.mean()), 3)
        if errs.size else None,
        "pos_err_p90_m": round(float(np.percentile(errs, 90)), 3)
        if errs.size else None,
        "within_1m_frac": round(float((errs < 1.0).mean()), 3)
        if errs.size else None,
    }


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mode", choices=("pca", "vision", "both"),
                    default="both")
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--det", choices=("oracle", "net"), default="oracle")
    ap.add_argument("--refine", action="store_true",
                    help="vision_depth_refine extension (compat=False)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    modes = ["pca", "vision"] if args.mode == "both" else [args.mode]
    out = [evaluate_poses(m, args.frames, args.det, refine=args.refine)
           for m in modes]
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
