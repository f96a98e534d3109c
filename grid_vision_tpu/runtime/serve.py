"""Fleet serving: N rigs' sensor mailboxes -> ONE batched device engine
-> per-rig viewer sessions.

The reference's deployment unit is one ROS node per vehicle
(src/grid_vision_node.cpp:533-540: single rig, single GPU). The TPU
deployment shape is the opposite: one process owns the chip and steps a
whole FLEET of rigs per dispatch (parallel/fleet.Fleet — vmap over a
rig-sharded mesh, zero per-step collectives), while sensor producers
(drivers, bridges, simulators — any process) write raw frames into
per-rig shared-memory mailboxes and viewers attach to per-rig sessions:

    server:    python -m grid_vision_tpu serve --rigs 4 --name fleet
    producer:  FleetClient("fleet", rig=2, cfg).publish_image(rgb8)
               ... .publish_cloud(xyz, intensity)
    viewer:    python -m grid_vision_tpu view --session fleet-r2

Semantics per rig match the single-rig live loop (runtime/live.py):
latest-wins mailboxes, stale frames reused like the reference's member
buffers, missing sensors degrade through the Q1 gate (has_image /
has_cloud False). A slow viewer or absent producer never backpressures
the fleet step.

`--selftest N` runs N synthetic producer threads in-process (one
SyntheticScene per rig) — the demo and the test path.
"""

from __future__ import annotations

import dataclasses
import threading
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GridVisionConfig
from ..io.scene import SyntheticScene
from ..parallel.fleet import Fleet
from ..types import Obs, PointCloud
from . import native
from .session import SessionPublisher

IMAGE_CHANNEL = "image"
CLOUD_CHANNEL = "cloud"


def rig_session(name: str, rig: int) -> str:
    return f"{name}-r{rig}"


def _image_box(name: str, rig: int, cfg: GridVisionConfig,
               create: bool) -> native.ShmMailbox:
    h, w = cfg.camera_image_height, cfg.camera_image_width
    return native.ShmMailbox(
        native.shm_path(rig_session(name, rig), IMAGE_CHANNEL),
        capacity=h * w * 3, create=create)


def _cloud_box(name: str, rig: int, cfg: GridVisionConfig,
               create: bool) -> native.ShmMailbox:
    return native.ShmMailbox(
        native.shm_path(rig_session(name, rig), CLOUD_CHANNEL),
        capacity=cfg.max_points * 16 * 4, create=create)


class FleetClient:
    """Producer-side handle: publish one rig's sensor frames from any
    process. Mirrors live.LiveSource's publish API over shm."""

    def __init__(self, name: str, rig: int, cfg: GridVisionConfig):
        self.cfg = cfg
        self._img = _image_box(name, rig, cfg, create=False)
        self._cloud = _cloud_box(name, rig, cfg, create=False)
        # Producer-side telemetry: points dropped by the capacity clamp
        # (a real LiDAR burst beyond the negotiated mailbox size must
        # degrade by subsampling, never by killing the producer thread).
        self.points_dropped = 0
        self.frames_clamped = 0

    def publish_image(self, rgb8: np.ndarray, stamp_ns: int = 0) -> None:
        self._img.write(
            np.ascontiguousarray(rgb8, np.uint8).tobytes(), stamp_ns)

    def publish_cloud(self, xyz: np.ndarray,
                      intensity: Optional[np.ndarray] = None,
                      stamp_ns: int = 0) -> None:
        """Publish one LiDAR scan (n, 3) [+ (n,) intensity].

        Clamps to the mailbox capacity negotiated from the server's shm
        header: an oversize scan is uniformly subsampled (even angular
        coverage — LiDAR scans are angle-ordered) instead of raising
        into the producer thread, and the drop is counted in
        ``points_dropped`` / ``frames_clamped``.
        """
        n = int(xyz.shape[0])
        cap_pts = max(int(self._cloud.capacity) // 16, 1)
        if n > cap_pts:
            keep = np.linspace(0, n - 1, cap_pts).round().astype(np.int64)
            xyz = xyz[keep]
            if intensity is not None:
                intensity = intensity[keep]
            self.points_dropped += n - cap_pts
            self.frames_clamped += 1
            n = cap_pts
        blob = np.zeros((n, 4), np.float32)
        blob[:, :3] = xyz
        if intensity is not None:
            blob[:, 3] = intensity
        self._cloud.write(blob.tobytes(), stamp_ns)

    def close(self) -> None:
        self._img.close()
        self._cloud.close()


class FleetServer:
    """Owns the device: polls every rig's mailboxes, steps the fleet in
    one dispatch, publishes per-rig sessions."""

    def __init__(self, name: str, cfg: GridVisionConfig, n_rigs: int,
                 publish_every: int = 1, overlay: bool = False,
                 mesh=None, shared: bool = False,
                 rig_extrinsics=None, chunk: int = 1,
                 track: bool = False, track_dt: float = 0.05,
                 tcfg=None, forecast_horizons=None):
        """shared=True runs as a FUSION HUB: all rigs' evidence merges
        into ONE world grid (parallel/shared_grid.py; rig_extrinsics is
        an optional list of per-rig Extrinsics placing each sensor in
        the world frame) published as session "<name>-world"; otherwise
        each rig keeps its own grid and session (the fleet shape).

        chunk>1 (shared mode only) scan-chains K world ticks into ONE
        device dispatch (SharedGrid.call_chunk) — throughput mode for a
        latency-bound host link, at the price of K-tick output latency
        (mirrors Engine.call_packed_chunk).

        track=True (fleet mode only) runs the per-rig multi-object
        tracker (ops/tracking.py, Fleet.tracked_step) in the same
        dispatch: each rig's session gains stable-id track markers
        (io/viz.track_markers) and the server accumulates tracker
        telemetry in .track_totals. track_dt is the inter-tick seconds
        the velocity model assumes (pass 1/hz of the spin cadence).

        forecast_horizons (requires track=True): K horizon seconds,
        e.g. (0.5, 1.0, 2.0). At every publish cadence each rig's
        session additionally carries PREDICTIVE occupancy — where the
        confirmed tracks will be at t + h (ops/tracking.
        forecast_occupancy, int8 probability x 100 planes on the grid
        raster; the 'forecast' session channel and the viewer's
        /forecast.gvd stream). Calibration:
        tools/eval_tracking_report.py --forecast / docs/QUALITY.md.
        The reference grid is purely reactive — no
        counterpart."""
        self.name = name
        self.cfg = cfg
        self.n_rigs = n_rigs
        self.publish_every = publish_every
        self.shared = shared
        if chunk > 1 and not shared:
            raise ValueError("chunk>1 requires shared=True (the per-rig "
                             "fleet already scans internally)")
        if track and shared:
            raise ValueError("track=True requires fleet mode (the hub "
                             "publishes only the fused world grid)")
        self.chunk = max(int(chunk), 1)
        self.track = track
        self._obs_buf: List[Obs] = []
        if shared:
            from ..parallel.shared_grid import SharedGrid
            from ..types import Extrinsics
            self.grid = SharedGrid(cfg, n_rigs, mesh=mesh)
            self.world_lo = self.grid.init_grid()
            from ..types import tree_stack
            ext = (rig_extrinsics
                   or [Extrinsics.identity()] * n_rigs)
            self._extr_b = tree_stack(ext)
            self._pubs = [SessionPublisher(f"{name}-world", cfg,
                                           overlay=False)]
            self.dropped_total = 0
            self._dropped_dev = jnp.zeros((), jnp.int32)
        else:
            self.fleet = Fleet(cfg, n_rigs, mesh=mesh)
            self.states = self.fleet.init_states()
            self._pubs = [SessionPublisher(rig_session(name, r), cfg,
                                           overlay=overlay)
                          for r in range(n_rigs)]
            if track:
                from ..ops.tracking import TrackConfig
                self.tcfg = tcfg or TrackConfig()
                self.track_dt = float(track_dt)
                self.tracks = self.fleet.init_tracks(self.tcfg)
                self.track_totals = {"matched": 0, "spawned": 0,
                                     "killed": 0, "spawn_dropped": 0}
        if forecast_horizons and not track:
            raise ValueError("forecast_horizons requires track=True "
                             "(forecasts project tracked velocities)")
        self.forecast_horizons = (tuple(float(h) for h in
                                        forecast_horizons)
                                  if forecast_horizons else None)
        self._img_boxes = [_image_box(name, r, cfg, create=True)
                           for r in range(n_rigs)]
        self._cloud_boxes = [_cloud_box(name, r, cfg, create=True)
                             for r in range(n_rigs)]
        self._last_images = [
            np.zeros((cfg.camera_image_height, cfg.camera_image_width, 3),
                     np.float32) for _ in range(n_rigs)]
        # last raw host cloud per rig (lidar frame), republished on the
        # session cloudviz channel for the 3D operator view's
        # PointCloud2 display (io/viz3d.py)
        self._last_clouds: List[Optional[np.ndarray]] = [None] * n_rigs
        if not shared:
            ex = self.fleet.extrinsics
            self._lidar_to_base = (np.asarray(ex.camera_to_base)
                                   @ np.asarray(ex.lidar_to_camera))
        self.parse_errors = 0
        # Cumulative fleet-wide saturation telemetry (StepOutput
        # .saturation summed over rigs at every publish cadence): the
        # serving-layer view of the capacity clamps (pre-NMS top-k, Q7
        # orientation clamp, per-box cloud truncation, budget drops).
        self.saturation_totals = {
            "prenms_overflow": 0, "orientation_clamped": 0,
            "box_cloud_truncated": 0, "orientation_dropped": 0,
            "static_depth_clamped": 0}

    def poll_batch(self) -> Obs:
        """Latest-wins read of every rig's mailboxes -> batched host Obs
        (leading rig axis). Stale frames are reused (reference member-
        buffer semantics); never-seen sensors gate through Q1."""
        cfg = self.cfg
        n = self.n_rigs
        h, w = cfg.camera_image_height, cfg.camera_image_width
        images = np.zeros((n, h, w, 3), np.float32)
        xyz = np.full((n, cfg.max_points, 3), PointCloud.PAD_SENTINEL,
                      np.float32)
        inten = np.zeros((n, cfg.max_points), np.float32)
        counts = np.zeros((n,), np.int32)
        has_img = np.zeros((n,), bool)
        has_cloud = np.zeros((n,), bool)
        for r in range(n):
            # A malformed producer frame must never kill the server: a
            # long-lived hub outlives buggy/mismatched publishers. Bad
            # payloads are dropped (counted) and the rig degrades
            # through the Q1 gate exactly like a silent sensor.
            frame = self._img_boxes[r].read()
            if frame is not None:
                data, _stamp, _seq = frame
                if len(data) == h * w * 3:
                    self._last_images[r] = np.frombuffer(
                        data, np.uint8).reshape(h, w, 3).astype(
                            np.float32)
                    has_img[r] = True
                else:
                    self.parse_errors += 1
            images[r] = self._last_images[r]
            cframe = self._cloud_boxes[r].read()
            if cframe is not None:
                data, _stamp, _seq = cframe
                if len(data) % 16 == 0 and len(data) > 0:
                    n_pts = len(data) // 16
                    x, i_, c = native.pack_cloud(data, n_pts, 16, 0, 12,
                                                 cfg.max_points)
                    xyz[r], inten[r], counts[r] = x, i_, c
                    has_cloud[r] = c > 0
                    if c > 0:
                        self._last_clouds[r] = np.array(x[:c])
                else:
                    self.parse_errors += 1
        return Obs(
            image=jnp.asarray(images),
            cloud=PointCloud(xyz=jnp.asarray(xyz),
                             intensity=jnp.asarray(inten),
                             count=jnp.asarray(counts)),
            has_image=jnp.asarray(has_img),
            has_cloud=jnp.asarray(has_cloud))

    def step(self, i: int) -> None:
        if self.shared:
            obs = self.poll_batch()
            if self.chunk > 1:
                self._obs_buf.append(obs)
                if len(self._obs_buf) < self.chunk:
                    return
                from ..types import tree_stack
                obs_c = tree_stack(self._obs_buf)
                self._obs_buf.clear()
                self.world_lo, occ_c, dropped = self.grid.call_chunk(
                    self.world_lo, obs_c, self._extr_b,
                    jax.random.PRNGKey(i))
                # call_chunk materializes every tick's grid (delayed
                # publish stream); the hub's publish cadence shows the
                # newest one
                occ = occ_c[-1]
            else:
                self.world_lo, occ, dropped = self.grid(
                    self.world_lo, obs, self._extr_b,
                    jax.random.PRNGKey(i))
            # accumulate on device (async add); readback only at
            # publish cadence — a per-tick device_get would rate-cap
            # the hub on this tunnel's 50ms+ readback latency
            self._dropped_dev = self._dropped_dev + dropped
            if i % self.publish_every == 0:
                self.dropped_total = int(
                    jax.device_get(self._dropped_dev))
                self._pubs[0].publish(i, _grid_only_output(
                    occ, self.cfg))
            return
        obs = self.fleet.shard_obs(self.poll_batch())
        if self.track:
            self.states, self.tracks, outs, tstats = (
                self.fleet.tracked_step(self.states, self.tracks, obs,
                                        dt=self.track_dt,
                                        tcfg=self.tcfg))
        else:
            self.states, outs = self.fleet(self.states, obs)
        if i % self.publish_every == 0:
            outs = jax.device_get(outs)
            for k in self.saturation_totals:
                self.saturation_totals[k] += int(
                    np.sum(getattr(outs.saturation, k)))
            host_tracks = None
            forecast_b = None
            if self.track:
                from ..io.viz import track_markers
                if self.forecast_horizons:
                    # one fleet-wide dispatch at publish cadence; the
                    # device_get rides the same sync as the outs fetch
                    forecast_b = np.asarray(self.fleet.forecast(
                        self.tracks, self.forecast_horizons, self.tcfg))
                host_tracks = jax.device_get(self.tracks)
                tstats = jax.device_get(tstats)
                for k in self.track_totals:
                    self.track_totals[k] += int(
                        np.sum(getattr(tstats, k)))
            for r in range(self.n_rigs):
                out_r = jax.tree_util.tree_map(lambda a: a[r], outs)
                extra = None
                if host_tracks is not None:
                    tr_r = jax.tree_util.tree_map(lambda a: a[r],
                                                  host_tracks)
                    extra = track_markers(tr_r, self.tcfg)
                cloud_r = None
                if self._last_clouds[r] is not None:
                    from ..runtime.session import CLOUDVIZ_MAX_POINTS
                    pts = self._last_clouds[r]
                    if pts.shape[0] > CLOUDVIZ_MAX_POINTS:
                        keep = np.linspace(0, pts.shape[0] - 1,
                                           CLOUDVIZ_MAX_POINTS
                                           ).round().astype(np.int64)
                        pts = pts[keep]
                    # lidar -> base frame for the world-frame 3D view
                    cloud_r = pts @ self._lidar_to_base[:3, :3].T \
                        + self._lidar_to_base[:3, 3]
                self._pubs[r].publish(
                    i, out_r, image=self._last_images[r],
                    extra_markers=extra,
                    forecast=(None if forecast_b is None
                              else forecast_b[r]),
                    horizons=self.forecast_horizons,
                    cloud_xyz=cloud_r)

    def spin(self, steps: Optional[int] = None, hz: float = 20.0,
             stop: Optional[threading.Event] = None) -> int:
        period = 1.0 / hz
        i = 0
        t0 = time.perf_counter()
        while steps is None or i < steps:
            if stop is not None and stop.is_set():
                break
            self.step(i)
            i += 1
            sleep = t0 + i * period - time.perf_counter()
            if sleep > 0:
                time.sleep(sleep)
        return i

    def close(self, unlink: bool = True) -> None:
        for b in self._img_boxes + self._cloud_boxes:
            if unlink:
                b.unlink()   # server created them; mirror publisher cleanup
            b.close()
        for p in self._pubs:
            if unlink:
                p.unlink()
            p.close()



def _grid_only_output(occupancy, cfg: GridVisionConfig):
    """Minimal StepOutput carrying just the fused world grid (the
    shared session has no single-rig boxes/poses to publish)."""
    from ..ops.rasterize import export_occupancy_i8
    from ..types import (Boxes, LShapePoses, SaturationStats, StepOutput)
    zero = jnp.zeros((), jnp.int32)
    return StepOutput(
        boxes=Boxes.empty(cfg.max_detections),
        poses=LShapePoses.empty(cfg.max_orientation_batch),
        static_points=jnp.zeros((cfg.max_detections, 3)),
        static_depths=jnp.full((cfg.max_detections,), -1.0),
        static_boxes=Boxes.empty(cfg.max_detections),
        occupancy_i8=export_occupancy_i8(occupancy),
        saturation=SaturationStats(
            prenms_overflow=zero, orientation_clamped=zero,
            box_cloud_truncated=zero, orientation_dropped=zero,
            static_depth_clamped=zero))


def selftest_producers(name: str, cfg: GridVisionConfig, n_rigs: int,
                       hz: float, stop: threading.Event) -> List[threading.Thread]:
    """One synthetic-scene producer thread per rig (the demo/test feed)."""

    def produce(rig: int):
        scene = SyntheticScene(cfg, seed=rig)
        scene.add_default_traffic()
        client = FleetClient(name, rig, cfg)
        t0 = time.perf_counter()
        while not stop.is_set():
            t = time.perf_counter() - t0
            client.publish_image(
                np.clip(scene.image_at(t), 0, 255).astype(np.uint8))
            client.publish_cloud(scene.cloud_at(t))
            time.sleep(1.0 / hz)
        client.close()

    threads = [threading.Thread(target=produce, args=(r,), daemon=True)
               for r in range(n_rigs)]
    for th in threads:
        th.start()
    return threads


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(
        prog="grid_vision_tpu serve", description=__doc__)
    ap.add_argument("--name", default="fleet")
    ap.add_argument("--rigs", type=int, default=4)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--hz", type=float, default=20.0)
    ap.add_argument("--publish-every", type=int, default=1)
    ap.add_argument("--config", default=None)
    ap.add_argument("--selftest", action="store_true",
                    help="feed every rig from an in-process synthetic "
                         "scene producer thread")
    ap.add_argument("--shared", action="store_true",
                    help="fusion-hub mode: all rigs merge into ONE "
                         "world grid (view --session NAME-world)")
    ap.add_argument("--chunk", type=int, default=1,
                    help="shared mode: scan-chain K world ticks per "
                         "device dispatch (throughput mode; K-tick "
                         "output latency)")
    ap.add_argument("--track", action="store_true",
                    help="fleet mode: run the per-rig multi-object "
                         "tracker in the same dispatch; sessions gain "
                         "stable-id track markers")
    ap.add_argument("--forecast", default=None, metavar="H1,H2,...",
                    help="with --track: publish predictive occupancy "
                         "at these horizons (seconds, e.g. 0.5,1,2) on "
                         "each rig's 'forecast' channel and the "
                         "viewer's /forecast.gvd stream")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ..config import load_config
    cfg = (load_config(args.config) if args.config
           else GridVisionConfig())
    if args.track:
        # tracking needs real detections; default to the shipped
        # checkpoints when the config names none (same convention as
        # run --track / eval-pose --det net)
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
    horizons = (tuple(float(h) for h in args.forecast.split(","))
                if args.forecast else None)
    server = FleetServer(args.name, cfg, args.rigs,
                         publish_every=args.publish_every,
                         shared=args.shared, chunk=args.chunk,
                         track=args.track, track_dt=1.0 / args.hz,
                         forecast_horizons=horizons)
    stop = threading.Event()
    if args.selftest:
        selftest_producers(args.name, cfg, args.rigs, args.hz, stop)
    view_session = (f"{args.name}-world" if args.shared
                    else rig_session(args.name, 0))
    print(f"serving {'fusion hub' if args.shared else 'fleet'} "
          f"{args.name!r}: {args.rigs} rigs at {args.hz:.0f} Hz "
          f"(view: python -m grid_vision_tpu view "
          f"--session {view_session})", flush=True)
    try:
        n = server.spin(steps=args.steps, hz=args.hz)
        print(f"served {n} fleet steps", flush=True)
        if args.track:
            t = server.track_totals
            print(f"tracker: matched {t['matched']} spawned "
                  f"{t['spawned']} killed {t['killed']} "
                  f"spawn_dropped {t['spawn_dropped']}", flush=True)
    finally:
        stop.set()
        server.close()


if __name__ == "__main__":
    main()
