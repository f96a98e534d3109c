"""End-to-end demo: `python -m grid_vision_tpu.demo [--mode pca|vision]`.

Streams a synthetic 10 Hz camera+LiDAR sequence through the fused engine
(the reference's CARLA-topics-to-RViz loop, headless): moving traffic in
front of a ground plane, grid snapshots written as PGM, detections as
PPM, markers as JSON.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from .config import GridVisionConfig
from .io.scene import SyntheticScene
from .io.viz import draw_boxes, grid_to_rgb, markers_from_output, write_ppm
from .pipeline import Engine
from .runtime.stream import replay
from .runtime import native
from .types import Extrinsics

# camera (x right, y down, z fwd) -> base (x fwd, y left, z up)
_R_CB = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float32)


def default_extrinsics() -> Extrinsics:
    import jax.numpy as jnp
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = _R_CB
    return Extrinsics(lidar_to_camera=jnp.eye(4), camera_to_base=jnp.asarray(T))


def oracle_boxes(scene: SyntheticScene, t: float, cfg: GridVisionConfig):
    """Ground-truth detections from the scene (the demo's stand-in for a
    trained detector — the reference's weight blobs are unrecoverable, so
    random-init nets detect nothing; this drives the full downstream)."""
    import jax.numpy as jnp
    from .types import Boxes
    cap = cfg.max_detections
    xyxy = np.zeros((cap, 4), np.float32)
    conf = np.zeros((cap,), np.float32)
    label = np.full((cap,), 10, np.int32)
    valid = np.zeros((cap,), bool)
    n = 0
    for i in range(len(scene.objects)):
        bb = scene.bbox_at(i, t)
        if bb is None or n >= cap:
            continue
        xyxy[n] = [bb["x_min"], bb["y_min"], bb["x_max"], bb["y_max"]]
        conf[n] = 0.9
        label[n] = bb["label"]
        valid[n] = True
        n += 1
    return Boxes(xyxy=jnp.asarray(xyxy), confidence=jnp.asarray(conf),
                 label=jnp.asarray(label), valid=jnp.asarray(valid))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mode", choices=["pca", "vision"], default="pca")
    ap.add_argument("--det", choices=["oracle", "net"], default="oracle",
                    help="oracle: ground-truth boxes from the scene; "
                         "net: the (random-init unless checkpointed) "
                         "YOLOv4-tiny")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--out", default="demo_out")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    cfg = GridVisionConfig(
        use_vision_orientation=(args.mode == "vision"),
        max_points=8192,
        # net mode picks up trained checkpoints from weights/ if present
        detection_weights_file="/weights/detector.npz"
        if args.det == "net" else "",
        vision_weights_file="/weights/orientation.npz"
        if args.mode == "vision" else "",
    )
    eng = Engine(cfg, extrinsics=default_extrinsics(), seed=0)
    scene = SyntheticScene(cfg, seed=0)
    scene.add_default_traffic()

    os.makedirs(args.out, exist_ok=True)
    snapshots = []

    def on_step(i, state, out):
        if i % 5 == 0 or i == args.steps - 1:
            snapshots.append((i, state, out))

    if args.det == "oracle":
        import functools
        import time as _time
        import jax
        from . import pipeline
        from .runtime.stream import obs_from_scene, ReplayResult
        fuse = jax.jit(functools.partial(pipeline.fuse, cfg=cfg))
        state = eng.init_state()
        t0 = _time.perf_counter()
        for i in range(args.steps):
            t = i / 10.0
            obs = obs_from_scene(scene, t, cfg)
            boxes = oracle_boxes(scene, t, cfg)
            state, out = fuse(eng.params, state, obs, boxes,
                              eng.extrinsics)
            on_step(i, state, out)
        jax.block_until_ready(state.log_odds)
        result = ReplayResult(n_steps=args.steps,
                              wall_s=_time.perf_counter() - t0, stats=[],
                              final_state=state)
    else:
        result = replay(eng, scene, n_steps=args.steps, hz=10.0,
                        on_step=on_step)

    for i, state, out in snapshots:
        grid = np.asarray(out.occupancy_i8)
        native.write_pgm(os.path.join(args.out, f"grid_{i:03d}.pgm"), grid)
        img = draw_boxes(np.asarray(scene.image_at(i / 10.0)), out.boxes)
        write_ppm(os.path.join(args.out, f"dets_{i:03d}.ppm"), img)
        with open(os.path.join(args.out, f"markers_{i:03d}.json"),
                  "w") as f:
            json.dump(markers_from_output(out), f, indent=1)

    lo = np.asarray(result.final_state.log_odds)
    print(f"steps: {result.n_steps}  wall: {result.wall_s:.2f}s  "
          f"rate: {result.achieved_hz:.1f} Hz")
    print(f"grid log-odds range: [{lo.min():.2f}, {lo.max():.2f}]  "
          f"occupied cells (p>0.5): {(1/(1+np.exp(-lo)) > 0.5).sum()}")
    print(f"snapshots in {args.out}/")


if __name__ == "__main__":
    main()
