"""Fleet server (runtime/serve.py): mailboxes in, batched fleet step,
per-rig sessions out — including the Q1 gate for a producer-less rig."""

import threading
import time

import numpy as np

from grid_vision_tpu.config import GridVisionConfig
from grid_vision_tpu.runtime import native
from grid_vision_tpu.runtime.serve import (FleetClient, FleetServer,
                                           rig_session,
                                           selftest_producers)
from grid_vision_tpu.runtime.session import GRID_CHANNEL, _decode_grid


def _mesh2():
    import jax
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()[:2]), ("rig",))


def small_cfg():
    return GridVisionConfig(max_points=2048, camera_image_height=96,
                            camera_image_width=128, fx=64.0, fy=64.0,
                            cx=64.0, cy=48.0, grid_x=24, grid_y=12,
                            resolution=0.25)


def test_fleet_server_selftest_roundtrip():
    cfg = small_cfg()
    name = "gvtest-serve"
    server = FleetServer(name, cfg, n_rigs=2, mesh=_mesh2())
    stop = threading.Event()
    try:
        selftest_producers(name, cfg, 2, hz=20.0, stop=stop)
        time.sleep(0.3)   # let producers write first frames
        server.spin(steps=4, hz=50.0)
        for r in range(2):
            box = native.ShmMailbox(
                native.shm_path(rig_session(name, r), GRID_CHANNEL))
            frame = box.read()
            box.close()
            assert frame is not None, f"rig {r} published no grid"
            grid, step, _ = _decode_grid(frame[0])
            assert grid.shape == cfg.grid_size
            assert step == 3
            assert (grid >= 0).all() and (grid <= 100).all()
    finally:
        stop.set()
        server.close()


def test_fleet_server_q1_gate_without_producer():
    """A rig nobody feeds must keep its prior grid (Q1: no inputs -> no
    update, not even decay)."""
    cfg = small_cfg()
    name = "gvtest-serve-q1"
    server = FleetServer(name, cfg, n_rigs=2, mesh=_mesh2())
    stop = threading.Event()
    try:
        # feed ONLY rig 0
        client = FleetClient(name, 0, cfg)
        client.publish_image(np.full((96, 128, 3), 120, np.uint8))
        client.publish_cloud(
            np.random.default_rng(0).uniform(-5, 5, (500, 3))
            .astype(np.float32))
        client.close()
        server.spin(steps=2, hz=50.0)
        lo = np.asarray(server.states.log_odds)
        assert not np.allclose(lo[0], 0.0)     # fed rig updated
        np.testing.assert_allclose(lo[1], 0.0)  # unfed rig untouched (Q1)
    finally:
        stop.set()
        server.close()


def test_fleet_server_survives_garbage_payloads():
    """A malformed producer frame is dropped (counted), the server keeps
    stepping, and the rig degrades through the Q1 gate."""
    cfg = small_cfg()
    name = "gvtest-serve-garbage"
    server = FleetServer(name, cfg, n_rigs=2, mesh=_mesh2())
    try:
        img_box = native.ShmMailbox(
            native.shm_path(rig_session(name, 0), "image"))
        cloud_box = native.ShmMailbox(
            native.shm_path(rig_session(name, 0), "cloud"))
        img_box.write(b"\x01\x02\x03")           # wrong size
        cloud_box.write(b"\x00" * 13)            # not a 16-byte stride
        img_box.close()
        cloud_box.close()
        server.spin(steps=2, hz=50.0)
        # latest-wins: the same bad frame is re-polled every tick
        assert server.parse_errors >= 2
        lo = np.asarray(server.states.log_odds)
        np.testing.assert_allclose(lo, 0.0)      # Q1: nothing updated
    finally:
        server.close()


def test_fusion_hub_mode_publishes_world_grid():
    """shared=True: all rigs fuse into one world grid published as
    <name>-world; evidence from two rigs accumulates in one map."""
    import jax
    cfg = small_cfg()
    name = "gvtest-hub"
    server = FleetServer(name, cfg, n_rigs=2, mesh=_mesh2(), shared=True)
    stop = threading.Event()
    try:
        selftest_producers(name, cfg, 2, hz=20.0, stop=stop)
        time.sleep(0.3)
        server.spin(steps=3, hz=50.0)
        box = native.ShmMailbox(
            native.shm_path(f"{name}-world", GRID_CHANNEL))
        frame = box.read()
        box.close()
        assert frame is not None, "no world grid published"
        grid, step, _ = _decode_grid(frame[0])
        assert grid.shape == cfg.grid_size
        assert step == 2
        lo = np.asarray(server.world_lo)
        assert np.isfinite(lo).all()
    finally:
        stop.set()
        server.close()


def test_oversize_cloud_is_clamped_not_fatal():
    """A cloud bigger than the mailbox capacity is uniformly subsampled
    by the producer (telemetry counts the drop) and the rig keeps
    streaming — a real LiDAR burst must never kill a producer thread
    with a shm-write error (round-2 failure mode)."""
    cfg = small_cfg()
    name = "gvtest-serve-oversize"
    server = FleetServer(name, cfg, n_rigs=2, mesh=_mesh2())
    try:
        client = FleetClient(name, 0, cfg)
        cap_pts = int(client._cloud.capacity) // 16
        n = 10 * cap_pts                      # 10x oversize burst
        rng = np.random.default_rng(1)
        cloud = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
        client.publish_cloud(cloud, intensity=np.ones(n, np.float32))
        assert client.frames_clamped == 1
        assert client.points_dropped == n - cap_pts
        client.publish_image(np.full((96, 128, 3), 90, np.uint8))
        client.close()
        server.spin(steps=2, hz=100.0)
        lo = np.asarray(server.states.log_odds)
        assert np.isfinite(lo).all()
        assert not np.allclose(lo[0], 0.0)    # the rig still updated
        # a normal-size cloud publishes without touching the counters
        client2 = FleetClient(name, 0, cfg)
        client2.publish_cloud(cloud[:100])
        assert client2.frames_clamped == 0
        client2.close()
    finally:
        server.close()


def test_server_close_unlinks_sensor_mailboxes():
    """close(unlink=True) must remove the per-rig image/cloud mailbox
    files it created, not just the session publisher channels (ADVICE
    r2: stale gv_*-r*.{image,cloud}.mbx files after every run)."""
    import os
    cfg = small_cfg()
    name = "gvtest-serve-unlink"
    server = FleetServer(name, cfg, n_rigs=2, mesh=_mesh2())
    paths = [native.shm_path(rig_session(name, r), ch)
             for r in range(2) for ch in ("image", "cloud")]
    for p in paths:
        assert os.path.exists(p), p
    server.close(unlink=True)
    for p in paths:
        assert not os.path.exists(p), f"stale mailbox left behind: {p}"


def test_selftest_surfaces_saturation_telemetry():
    """The serving layer must surface the pipeline's saturation
    telemetry (capacity clamps), not swallow it: after a selftest spin
    the cumulative counters exist and are sane (>= 0; zero on this tiny
    scene)."""
    cfg = small_cfg()
    name = "gvtest-serve-sat"
    server = FleetServer(name, cfg, n_rigs=2, mesh=_mesh2())
    stop = threading.Event()
    try:
        selftest_producers(name, cfg, 2, hz=20.0, stop=stop)
        time.sleep(0.3)
        server.spin(steps=3, hz=50.0)
        sat = server.saturation_totals
        assert set(sat) == {"prenms_overflow", "orientation_clamped",
                            "box_cloud_truncated", "orientation_dropped",
                            "static_depth_clamped"}
        assert all(isinstance(v, int) and v >= 0 for v in sat.values()), sat
    finally:
        stop.set()
        server.close()


def test_fleet_server_tracked_mode():
    """serve --track: the tracker runs in the fleet dispatch, sessions
    carry (possibly empty) stable-id track markers, and tracker
    telemetry accumulates. Structural test — whether tracks confirm
    depends on the detector firing on the tiny scene; track-quality
    itself is covered by tests/test_tracking.py."""
    import json

    from grid_vision_tpu.runtime.session import MARKERS_CHANNEL

    cfg = small_cfg()
    name = "gvtest-serve-trk"
    server = FleetServer(name, cfg, n_rigs=2, mesh=_mesh2(),
                         track=True, track_dt=0.05)
    stop = threading.Event()
    try:
        selftest_producers(name, cfg, 2, hz=20.0, stop=stop)
        time.sleep(0.3)
        server.spin(steps=4, hz=50.0)
        # tracker state advanced per rig (leading rig axis kept)
        ids = np.asarray(server.tracks.id)
        assert ids.shape[0] == 2
        tt = server.track_totals
        assert set(tt) == {"matched", "spawned", "killed",
                           "spawn_dropped"}
        assert all(isinstance(v, int) and v >= 0 for v in tt.values()), tt
        # per-rig markers JSON decodes; any track markers carry stable ids
        for r in range(2):
            box = native.ShmMailbox(
                native.shm_path(rig_session(name, r), MARKERS_CHANNEL))
            frame = box.read()
            box.close()
            assert frame is not None, f"rig {r} published no markers"
            payload = json.loads(frame[0].decode())
            assert isinstance(payload["markers"], list)
            for m in payload["markers"]:
                if m.get("ns") == "track":
                    assert isinstance(m["track_id"], int)
    finally:
        stop.set()
        server.close()


def test_fleet_server_track_requires_fleet_mode():
    import pytest

    cfg = small_cfg()
    with pytest.raises(ValueError):
        FleetServer("gvtest-serve-trk2", cfg, n_rigs=2, mesh=_mesh2(),
                    shared=True, track=True)


def test_fleet_server_forecast_channel():
    """serve --track --forecast: each rig's session gains the forecast
    channel with K int8 probability planes on the grid raster (wiring
    test; calibration quality is tests/test_tracking.py +
    train/eval_tracking.forecast_calibration)."""
    from grid_vision_tpu.runtime.session import (FORECAST_CHANNEL,
                                                 _decode_forecast)

    cfg = small_cfg()
    name = "gvtest-serve-fc"
    horizons = (0.5, 1.5)
    server = FleetServer(name, cfg, n_rigs=2, mesh=_mesh2(),
                         track=True, track_dt=0.05,
                         forecast_horizons=horizons)
    stop = threading.Event()
    try:
        selftest_producers(name, cfg, 2, hz=20.0, stop=stop)
        time.sleep(0.3)
        server.spin(steps=3, hz=50.0)
        for r in range(2):
            box = native.ShmMailbox(
                native.shm_path(rig_session(name, r), FORECAST_CHANNEL))
            frame = box.read()
            box.close()
            assert frame is not None, f"rig {r} published no forecast"
            planes, got_h, step, _ = _decode_forecast(frame[0])
            assert planes.shape == (2,) + cfg.grid_size
            np.testing.assert_allclose(got_h, horizons)
            assert (planes >= 0).all() and (planes <= 100).all()
    finally:
        stop.set()
        server.close()


def test_fleet_server_forecast_requires_track():
    import pytest

    cfg = small_cfg()
    with pytest.raises(ValueError):
        FleetServer("gvtest-serve-fc2", cfg, n_rigs=2, mesh=_mesh2(),
                    forecast_horizons=(1.0,))
