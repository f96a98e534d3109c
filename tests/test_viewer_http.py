"""HTTP viewer surface (runtime/viewer.http_view): index + PNG frame
endpoints against a published session."""

import threading
import time
import urllib.request

import numpy as np

from grid_vision_tpu.config import GridVisionConfig
from grid_vision_tpu.runtime.session import SessionPublisher
from grid_vision_tpu.types import (Boxes, LShapePoses, SaturationStats,
                                   StepOutput)

import jax.numpy as jnp


def _fake_output(cfg):
    h, w = cfg.grid_size
    occ = np.full((h, w), 30, np.int8)
    occ[10:20, 4:8] = 90
    zero = jnp.zeros((), jnp.int32)
    return StepOutput(
        boxes=Boxes.empty(cfg.max_detections),
        poses=LShapePoses.empty(cfg.max_orientation_batch),
        static_points=jnp.zeros((cfg.max_detections, 3)),
        static_depths=jnp.full((cfg.max_detections,), -1.0),
        static_boxes=Boxes.empty(cfg.max_detections),
        occupancy_i8=jnp.asarray(occ),
        saturation=SaturationStats(prenms_overflow=zero,
                                   orientation_clamped=zero,
                                   box_cloud_truncated=zero,
                                   orientation_dropped=zero,
                                   static_depth_clamped=zero),
    )


def test_http_view_serves_index_and_grid_png():
    cfg = GridVisionConfig(grid_x=24, grid_y=12, resolution=0.25,
                           camera_image_height=32, camera_image_width=32,
                           fx=16.0, fy=16.0, cx=16.0, cy=16.0,
                           max_points=64)
    session = "gvtest-http"
    pub = SessionPublisher(session, cfg, overlay=False)
    pub.publish(0, _fake_output(cfg))

    from grid_vision_tpu.runtime import viewer
    import os
    port = 19000 + os.getpid() % 10000
    th = threading.Thread(
        target=viewer.http_view,
        args=(session, port),
        kwargs={"max_seconds": 12.0},
        daemon=True)
    th.start()
    time.sleep(1.0)
    try:
        idx = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=10).read()
        assert b"grid" in idx
        png = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/grid.png", timeout=10).read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        assert len(png) > 100
    finally:
        pub.unlink()
        pub.close()


def test_forecast_gvd_stream_roundtrip():
    """/forecast.gvd streams the K predicted-occupancy planes as one
    (K*rows, cols) delta-coded image; gvd_client decodes it exactly."""
    import os

    import numpy as np

    cfg = GridVisionConfig(grid_x=24, grid_y=12, resolution=0.25,
                           camera_image_height=32, camera_image_width=32,
                           fx=16.0, fy=16.0, cx=16.0, cy=16.0,
                           max_points=64)
    session = "gvtest-http-fc"
    pub = SessionPublisher(session, cfg, overlay=False)
    rng = np.random.default_rng(0)
    k = 2
    planes = rng.integers(0, 101, (k,) + cfg.grid_size).astype(np.int8)

    from grid_vision_tpu.runtime import viewer
    port = 19000 + (os.getpid() + 77) % 10000
    th = threading.Thread(
        target=viewer.http_view, args=(session, port),
        kwargs={"max_seconds": 14.0}, daemon=True)
    th.start()
    time.sleep(1.0)

    stop = threading.Event()

    def feed():
        i = 0
        while not stop.is_set():
            pub.publish(i, _fake_output(cfg), forecast=planes,
                        horizons=(0.5, 1.0))
            i += 1
            time.sleep(0.05)

    feeder = threading.Thread(target=feed, daemon=True)
    feeder.start()
    try:
        got = list(viewer.gvd_client("127.0.0.1", port, max_records=2,
                                     path="/forecast.gvd"))
        assert len(got) == 2
        grid, _step, _stamp = got[0]
        assert grid.shape == (k * cfg.grid_size[0], cfg.grid_size[1])
        np.testing.assert_array_equal(
            grid.reshape(k, *cfg.grid_size), planes)
    finally:
        stop.set()
        feeder.join(timeout=2)
        pub.unlink()
        pub.close()
