"""Live-viewer stack: shm mailboxes (native + Python-fallback interop),
session publish/subscribe, PNG codec, grid rendering, HTTP endpoints."""

import json
import os
import threading
import urllib.request

import jax.numpy as jnp
import numpy as np
import pytest

from grid_vision_tpu.config import GridVisionConfig
from grid_vision_tpu.io import png
from grid_vision_tpu.runtime import native
from grid_vision_tpu.runtime.session import (SessionPublisher,
                                             SessionSubscriber)
from grid_vision_tpu.runtime.viewer import (ansi_halfblock, grid_frame_rgb,
                                            terminal_view)
from grid_vision_tpu.types import (Boxes, LShapePoses, SaturationStats,
                                   StepOutput)


def _fallback_box(path, capacity=0, create=False, monkeypatch=None):
    """Construct a ShmMailbox forced onto the pure-Python mmap path."""
    import grid_vision_tpu.runtime.native as nat
    orig = nat._load
    nat._load = lambda: None
    try:
        return nat.ShmMailbox(path, capacity=capacity, create=create)
    finally:
        nat._load = orig


# ---------------------------------------------------------------------
# shm mailbox
# ---------------------------------------------------------------------

def test_shm_mailbox_roundtrip(tmp_path):
    p = str(tmp_path / "a.mbx")
    w = native.ShmMailbox(p, capacity=256, create=True)
    assert w.read() is None                       # nothing yet
    assert w.write(b"frame-1", stamp_ns=7) == 1
    r = native.ShmMailbox(p)
    data, stamp, seq = r.read()
    assert (data, stamp, seq) == (b"frame-1", 7, 1)
    assert r.read(min_seq=1) is None              # already seen
    w.write(b"frame-2!", stamp_ns=8)
    data, stamp, seq = r.read(min_seq=1)
    assert (data, stamp, seq) == (b"frame-2!", 8, 2)
    with pytest.raises(ValueError):
        w.write(b"x" * 300)                       # over capacity
    r.close()
    w.unlink()
    assert not os.path.exists(p)


def test_shm_mailbox_python_fallback_interop(tmp_path):
    """Native writer <-> pure-Python reader and vice versa (identical
    on-disk layout)."""
    p = str(tmp_path / "interop.mbx")
    w = native.ShmMailbox(p, capacity=128, create=True)
    w.write(b"native-wrote", stamp_ns=11)
    r = _fallback_box(p)
    assert r._mm is not None or not native.available()
    data, stamp, seq = r.read()
    assert (data, stamp, seq) == (b"native-wrote", 11, 1)
    # Python fallback writes, native reads
    r.write(b"python-wrote-2", stamp_ns=12)
    got = w.read()
    assert got == (b"python-wrote-2", 12, 2)
    w.close()
    r.close()


# ---------------------------------------------------------------------
# PNG codec
# ---------------------------------------------------------------------

def test_png_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (37, 53, 3), np.uint8)
    data = png.encode_rgb(img)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    back = png.decode_rgb(data)
    np.testing.assert_array_equal(back, img)


def test_png_grayscale_and_float():
    img = np.linspace(0, 300, 16 * 16, dtype=np.float32).reshape(16, 16)
    back = png.decode_rgb(png.encode_rgb(img))
    assert back.shape == (16, 16, 3)
    assert back.max() == 255  # clipped


# ---------------------------------------------------------------------
# session publish/subscribe + render
# ---------------------------------------------------------------------

def _fake_output(cfg, with_cube=True):
    gx, gy = cfg.grid_size
    grid = np.zeros((gx, gy), np.int8)
    grid[10:20, 5:15] = 90
    boxes = Boxes.empty(cfg.max_detections)
    poses = LShapePoses.empty(8)
    if with_cube:
        poses = LShapePoses(
            position=poses.position.at[0].set(
                jnp.asarray([10.0, 0.0, 0.0])),
            quat=poses.quat,
            length=poses.length.at[0].set(4.0),
            width=poses.width.at[0].set(2.0),
            height=poses.height.at[0].set(1.5),
            label=poses.label.at[0].set(9),
            valid=poses.valid.at[0].set(True),
        )
    return StepOutput(
        boxes=boxes, poses=poses,
        static_points=jnp.zeros((cfg.max_detections, 3)),
        static_depths=jnp.full((cfg.max_detections,), -1.0),
        static_boxes=Boxes.empty(cfg.max_detections),
        occupancy_i8=jnp.asarray(grid),
        saturation=SaturationStats.zeros(),
    )


@pytest.fixture
def small_cfg():
    return GridVisionConfig(grid_x=24, grid_y=12, resolution=0.25,
                            max_points=128, max_detections=8)


def _session_path_patch(monkeypatch, tmp_path):
    monkeypatch.setattr(
        native, "shm_path",
        lambda session, channel: str(tmp_path / f"{session}.{channel}.mbx"))
    # session.py imported `native` as a module, so the patch is visible.


def test_session_publish_subscribe(small_cfg, monkeypatch, tmp_path):
    _session_path_patch(monkeypatch, tmp_path)
    pub = SessionPublisher("t1", small_cfg)
    out = _fake_output(small_cfg)
    image = np.full((small_cfg.camera_image_height,
                     small_cfg.camera_image_width, 3), 60.0, np.float32)
    pub.publish(3, out, image=image, stamp_ns=999)

    sub = SessionSubscriber("t1")
    frame = sub.poll()
    assert frame is not None
    assert frame.step == 3 and frame.stamp_ns == 999
    gx, gy = small_cfg.grid_size
    assert frame.grid.shape == (gx, gy)
    assert frame.grid[12, 7] == 90
    assert frame.grid_meta["resolution"] == small_cfg.resolution
    assert any(m["type"] == "cube" for m in frame.markers)
    assert frame.overlay is not None
    assert frame.overlay.shape == (small_cfg.camera_image_height,
                                   small_cfg.camera_image_width, 3)
    # latest-wins: nothing new -> poll() returns None
    assert sub.poll() is None
    # new frame arrives
    pub.publish(4, out, image=image)
    assert sub.poll().step == 4
    sub.close()
    pub.unlink()


def test_grid_frame_rgb_markers(small_cfg, monkeypatch, tmp_path):
    _session_path_patch(monkeypatch, tmp_path)
    pub = SessionPublisher("t2", small_cfg, overlay=False)
    pub.publish(0, _fake_output(small_cfg))
    frame = SessionSubscriber("t2").poll()
    rgb = grid_frame_rgb(frame)
    gx, gy = small_cfg.grid_size
    assert rgb.shape == (gx, gy, 3)
    # the cube marker at (10, 0) must paint its cells blue-ish
    res = small_cfg.resolution
    max_x = small_cfg.grid_center[0] + small_cfg.grid_x / 2
    max_y = small_cfg.grid_center[1] + small_cfg.grid_y / 2
    ix = int(np.floor((max_x - 10.0) / res))
    iy = int(np.floor((max_y - 0.0) / res))
    b = rgb[ix, iy]
    assert b[2] > 200 and b[0] < 100  # _CUBE color
    pub.unlink()


def test_ansi_halfblock_shape():
    img = np.zeros((6, 4, 3), np.uint8)
    s = ansi_halfblock(img)
    assert s.count("\n") == 2  # 6 rows -> 3 lines
    assert "\x1b[38;2;0;0;0m" in s and s.endswith("\x1b[0m")


def test_terminal_view_draws(small_cfg, monkeypatch, tmp_path):
    import io
    _session_path_patch(monkeypatch, tmp_path)
    pub = SessionPublisher("t3", small_cfg, overlay=False)
    pub.publish(0, _fake_output(small_cfg))
    buf = io.StringIO()
    n = terminal_view("t3", max_seconds=0.4, out=buf)
    assert n >= 1
    assert "step=0" in buf.getvalue()
    pub.unlink()


def test_http_view_endpoints(small_cfg, monkeypatch, tmp_path):
    _session_path_patch(monkeypatch, tmp_path)
    from grid_vision_tpu.runtime import viewer as viewer_mod
    pub = SessionPublisher("t4", small_cfg)
    image = np.full((small_cfg.camera_image_height,
                     small_cfg.camera_image_width, 3), 80.0, np.float32)
    pub.publish(1, _fake_output(small_cfg), image=image)

    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    t = threading.Thread(target=viewer_mod.http_view,
                         args=("t4", port), kwargs={"max_seconds": 8.0},
                         daemon=True)
    t.start()
    import time
    deadline = time.time() + 5.0
    last_err = None
    while time.time() < deadline:
        try:
            body = urllib.request.urlopen(
                f"http://127.0.0.1:{port}/grid.png", timeout=2).read()
            break
        except Exception as e:  # server still starting
            last_err = e
            time.sleep(0.1)
    else:
        raise AssertionError(f"http viewer never came up: {last_err}")
    rgb = png.decode_rgb(body)
    gx, gy = small_cfg.grid_size
    assert rgb.shape == (2 * gx, 2 * gy, 3)  # scale=2
    doc = json.loads(urllib.request.urlopen(
        f"http://127.0.0.1:{port}/markers.json", timeout=2).read())
    assert doc["step"] == 1
    assert any(m["type"] == "cube" for m in doc["markers"])
    index = urllib.request.urlopen(
        f"http://127.0.0.1:{port}/", timeout=2).read().decode()
    assert "grid.mjpg" in index
    over = png.decode_rgb(urllib.request.urlopen(
        f"http://127.0.0.1:{port}/overlay.png", timeout=2).read())
    assert over.shape == (small_cfg.camera_image_height,
                          small_cfg.camera_image_width, 3)
    assert "view3d.mjpg" in index
    v3d = png.decode_rgb(urllib.request.urlopen(
        f"http://127.0.0.1:{port}/view3d.png", timeout=2).read())
    assert v3d.shape == (480, 640, 3)  # the 3D operator view
    pub.unlink()
