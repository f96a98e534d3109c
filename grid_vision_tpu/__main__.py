"""Unified CLI: ``python -m grid_vision_tpu <command>``.

The reference's entry point is a ROS 2 launch file that wires the node
to a parameter YAML (launch/grid_vision.launch.xml). The equivalents:

  run     stream a synthetic sequence through the engine with a config
          YAML (the reference YAML works as-is); --publish NAME exposes
          the session to viewers; --track adds the multi-object tracker
          (stable ids + velocities, shipped-weight detections)
  view    attach to a running session and watch the grid + markers live
          (terminal ANSI render, or --http PORT for a browser stream) —
          the RViz replacement
  demo    snapshot-producing demo (see demo.py for flags)
  train   fit the detector / orientation net on-device
  eval    detection quality: COCO-style mAP@0.5 on held-out scenes
  eval-pose  3D localization error vs scene ground truth
  serve   fleet server: N rigs' shm mailboxes -> one batched engine ->
          per-rig viewer sessions (--selftest for synthetic producers)
  record  record a packed-wire sensor drive to a .gvr file (the rosbag
          equivalent); play re-drives the engine from it byte-for-byte
  bench   the headline benchmark (one JSON line)

Examples:
  python -m grid_vision_tpu run --config config/grid_vision_cfg.yaml
  python -m grid_vision_tpu run --publish demo --steps 2000 &
  python -m grid_vision_tpu view --session demo
  python -m grid_vision_tpu view --session demo --http 8400
  python -m grid_vision_tpu demo --mode vision --det net
  python -m grid_vision_tpu train detector --steps 1000
  python -m grid_vision_tpu train orientation
  python -m grid_vision_tpu eval --source scene --images 64
"""

from __future__ import annotations

import sys


def _run(argv):
    import argparse

    ap = argparse.ArgumentParser(prog="grid_vision_tpu run")
    ap.add_argument("--config", default=None,
                    help="parameter YAML (reference format accepted)")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--hz", type=float, default=10.0)
    ap.add_argument("--realtime", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--publish", default=None, metavar="SESSION",
                    help="publish grid/markers/overlay for "
                         "`grid_vision_tpu view --session SESSION`")
    ap.add_argument("--timings", action="store_true",
                    help="log per-stage latencies each tick (the "
                         "reference's detection/orientation timers; "
                         "3-dispatch observability mode)")
    ap.add_argument("--track", action="store_true",
                    help="run the multi-object tracker (ops/tracking.py "
                         "extension): stable ids + base-frame velocity, "
                         "logged per tick and published as track markers")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from .config import GridVisionConfig, load_config
    from .demo import default_extrinsics
    from .io.scene import SyntheticScene
    from .pipeline import Engine
    from .runtime.stream import replay
    from .utils.stats import logger

    import logging
    logging.basicConfig(level=logging.INFO)
    cfg = (load_config(args.config) if args.config else GridVisionConfig())
    if args.track:
        # tracking needs real detections; default to the shipped
        # checkpoints when the config names none (same convention as
        # eval-pose --det net)
        import dataclasses
        import os
        w = {}
        if not cfg.detection_weights_file and os.path.exists(
                "weights/detector.npz"):
            w["detection_weights_file"] = "weights/detector.npz"
        if (cfg.use_vision_orientation and not cfg.vision_weights_file
                and os.path.exists("weights/orientation.npz")):
            w["vision_weights_file"] = "weights/orientation.npz"
        if w:
            cfg = dataclasses.replace(cfg, **w)
    eng = Engine(cfg, extrinsics=default_extrinsics())
    scene = SyntheticScene(cfg, seed=0)
    scene.add_default_traffic()
    on_step = None
    pub = None
    if args.publish:
        from .runtime.session import SessionPublisher
        import numpy as _np
        pub = SessionPublisher(args.publish, cfg)
        period = 1.0 / args.hz
        ex = eng.extrinsics
        l2b = (_np.asarray(ex.camera_to_base)
               @ _np.asarray(ex.lidar_to_camera))

        def on_step(i, state, out):
            # cloudviz channel feeds the 3D view's PointCloud2 display
            pts = scene.cloud_at(i * period).astype(_np.float32)
            cloud_base = pts @ l2b[:3, :3].T + l2b[:3, 3]
            pub.publish(i, out, image=scene.image_at(i * period),
                        cloud_xyz=cloud_base)
        logger.info("publishing session %r (attach with: python -m "
                    "grid_vision_tpu view --session %s)",
                    args.publish, args.publish)
    if args.track:
        from .io.viz import track_markers
        from .ops.tracking import TrackConfig
        from .runtime.stream import obs_from_scene
        import time as _time
        tcfg = TrackConfig()
        state, tracks = eng.init_state(), eng.init_tracks(tcfg)
        dt = 1.0 / args.hz
        t0 = _time.perf_counter()
        for i in range(args.steps):
            obs = obs_from_scene(scene, i * dt, cfg)
            state, tracks, out, tstats = eng.call_tracked(
                state, tracks, obs, dt=dt, tcfg=tcfg)
            tm = track_markers(tracks, tcfg)
            cubes = [m for m in tm if m["ns"] == "track"]
            logger.info(
                "step %d: %d confirmed tracks  %s", i, len(cubes),
                "  ".join(f"{m['label']} v={m['speed_mps']:.1f}m/s"
                          if m["speed_mps"] is not None else m["label"]
                          for m in cubes))
            if pub is not None:
                pub.publish(i, out, image=scene.image_at(i * dt),
                            extra_markers=tm)
            if args.realtime:
                sleep = (i + 1) * dt - (_time.perf_counter() - t0)
                if sleep > 0:
                    _time.sleep(sleep)
        if pub is not None:
            pub.close()
        return
    if args.timings:
        from .runtime.stream import obs_from_scene
        from .runtime.timing import TimedEngine
        import time as _time
        timed = TimedEngine(eng)
        state = eng.init_state()
        t0 = _time.perf_counter()
        for i in range(args.steps):
            obs = obs_from_scene(scene, i / args.hz, cfg)
            state, out, times = timed.step(state, obs)
            logger.info("step %d: %s", i, times)
            if pub is not None:
                pub.publish(i, out, image=scene.image_at(i / args.hz))
            if args.realtime:
                sleep = (i + 1) / args.hz - (_time.perf_counter() - t0)
                if sleep > 0:
                    _time.sleep(sleep)
        if pub is not None:
            pub.close()
        return
    res = replay(eng, scene, n_steps=args.steps, hz=args.hz,
                 realtime=args.realtime, on_step=on_step)
    if pub is not None:
        pub.close()
    logger.info("replayed %d steps at %.1f Hz (wall %.2fs)",
                res.n_steps, res.achieved_hz, res.wall_s)


def main():
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print(__doc__)
        return
    cmd, argv = sys.argv[1], sys.argv[2:]
    if cmd == "run":
        _run(argv)
    elif cmd == "view":
        import argparse
        ap = argparse.ArgumentParser(prog="grid_vision_tpu view")
        ap.add_argument("--session", required=True)
        ap.add_argument("--http", type=int, default=None, metavar="PORT")
        ap.add_argument("--seconds", type=float, default=None,
                        help="stop after N seconds (default: run forever)")
        ap.add_argument("--mode", choices=("2d", "3d"), default="2d",
                        help="terminal surface: top-down grid (2d) or "
                             "the RViz-style orbit view (3d)")
        a = ap.parse_args(argv)
        from .runtime import viewer
        if a.http is not None:
            viewer.http_view(a.session, a.http, max_seconds=a.seconds)
        else:
            viewer.terminal_view(a.session, max_seconds=a.seconds,
                                 mode=a.mode)
    elif cmd == "eval":
        from .train.eval_map import main as eval_main
        eval_main(argv)
    elif cmd == "eval-pose":
        from .train.eval_pose import main as eval_pose_main
        eval_pose_main(argv)
    elif cmd == "serve":
        from .runtime.serve import main as serve_main
        serve_main(argv)
    elif cmd == "record":
        import argparse
        ap = argparse.ArgumentParser(prog="grid_vision_tpu record")
        ap.add_argument("--out", required=True)
        ap.add_argument("--steps", type=int, default=100)
        ap.add_argument("--hz", type=float, default=10.0)
        ap.add_argument("--seed", type=int, default=0)
        ap.add_argument("--config", default=None)
        ap.add_argument("--cpu", action="store_true")
        a = ap.parse_args(argv)
        if a.cpu:
            import jax
            jax.config.update("jax_platforms", "cpu")
        from .config import GridVisionConfig, load_config
        from .runtime.record import record_scene
        cfg = load_config(a.config) if a.config else GridVisionConfig()
        n = record_scene(a.out, cfg, a.steps, hz=a.hz, seed=a.seed)
        print(f"recorded {n} frames -> {a.out}")
    elif cmd == "play":
        import argparse
        ap = argparse.ArgumentParser(prog="grid_vision_tpu play")
        ap.add_argument("path")
        ap.add_argument("--chunk", type=int, default=8)
        ap.add_argument("--session", default=None,
                        help="publish for `view --session NAME`")
        ap.add_argument("--grid-out", default=None, metavar="FILE.gvg",
                        help="record the output occupancy stream "
                             "(keyframe+delta codec, io/grid_codec.py)")
        ap.add_argument("--cpu", action="store_true")
        a = ap.parse_args(argv)
        if a.cpu:
            import jax
            jax.config.update("jax_platforms", "cpu")
        from .runtime.record import play
        n, _state = play(a.path, chunk=a.chunk, session=a.session,
                         grid_out=a.grid_out)
        print(f"played {n} frames from {a.path}")
    elif cmd == "demo":
        from .demo import main as demo_main
        demo_main(argv)
    elif cmd == "train":
        if not argv or argv[0] not in ("detector", "orientation"):
            print("usage: train {detector|orientation} [flags]")
            sys.exit(2)
        if argv[0] == "detector":
            from .train.fit_on_device import main as fit
        else:
            from .train.fit_orientation import main as fit
        fit(argv[1:])
    elif cmd == "bench":
        import runpy
        sys.argv = ["bench.py"]
        runpy.run_path("bench.py", run_name="__main__")
    else:
        print(f"unknown command {cmd!r}\n{__doc__}")
        sys.exit(2)


if __name__ == "__main__":
    main()
