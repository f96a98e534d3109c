"""Session output publishing: the engine side of the live viewer.

The reference's observability surface is RViz subscribed to three topics
(src/grid_vision_node.cpp:52-54: annotated detections image, the
nav_msgs occupancy grid, the MarkerArray). Here a running engine/fleet
session publishes the same three surfaces into named cross-process
shared-memory mailboxes (runtime/native.ShmMailbox), and any number of
viewer processes attach by session name:

    engine:  pub = SessionPublisher("demo", cfg)
             ... pub.publish(step, out, image=frame) each tick ...
    viewer:  python -m grid_vision_tpu view --session demo

Channels (latest-wins; a slow viewer never backpressures the engine):
    grid     <iiqQ>(rows, cols, step, stamp_ns) + int8 occupancy cells
    markers  JSON {"step", "stamp_ns", "markers": [...]} (io/viz dicts)
    overlay  <iiqQ>(h, w, step, stamp_ns) + rgb8 bytes (detection overlay)
"""

from __future__ import annotations

import json
import struct
from typing import List, Optional

import numpy as np

from ..config import GridVisionConfig
from ..io import viz
from ..types import StepOutput
from . import native

_HDR = struct.Struct("<iiqQ")

GRID_CHANNEL = "grid"
MARKERS_CHANNEL = "markers"
OVERLAY_CHANNEL = "overlay"


def _encode_array(arr: np.ndarray, step: int, stamp_ns: int) -> bytes:
    r, c = arr.shape[0], arr.shape[1]
    return _HDR.pack(r, c, step, stamp_ns) + arr.tobytes()


def _decode_grid(data: bytes):
    r, c, step, stamp = _HDR.unpack_from(data)
    grid = np.frombuffer(data, np.int8, offset=_HDR.size).reshape(r, c)
    return grid, step, stamp


def _decode_overlay(data: bytes):
    h, w, step, stamp = _HDR.unpack_from(data)
    img = np.frombuffer(data, np.uint8, offset=_HDR.size).reshape(h, w, 3)
    return img, step, stamp


class SessionPublisher:
    """Engine-side publisher. Create once; call publish() per step.

    Marker generation and the box overlay render are host-side numpy on
    already-fetched StepOutput arrays (the publishing path is outside the
    jit, exactly like the reference's publish calls sit after the GPU
    work in timerCallback).
    """

    def __init__(self, session: str, cfg: GridVisionConfig,
                 overlay: bool = True):
        self.session = session
        gx, gy = cfg.grid_size
        # Geometry shipped with every markers frame so viewers can place
        # world-frame markers onto grid cells without the engine's config.
        self._grid_meta = {
            "size": [gx, gy],
            "center": list(cfg.grid_center),
            "length": [float(cfg.grid_x), float(cfg.grid_y)],
            "resolution": cfg.resolution,
        }
        self._grid_box = native.ShmMailbox(
            native.shm_path(session, GRID_CHANNEL),
            capacity=_HDR.size + gx * gy, create=True)
        self._markers_box = native.ShmMailbox(
            native.shm_path(session, MARKERS_CHANNEL),
            capacity=1 << 20, create=True)
        self._overlay_box = None
        if overlay:
            h, w = cfg.camera_image_height, cfg.camera_image_width
            self._overlay_box = native.ShmMailbox(
                native.shm_path(session, OVERLAY_CHANNEL),
                capacity=_HDR.size + h * w * 3, create=True)

    def publish(self, step: int, out: StepOutput,
                image: Optional[np.ndarray] = None,
                stamp_ns: int = 0,
                extra_markers: Optional[List[dict]] = None) -> None:
        grid = np.asarray(out.occupancy_i8, np.int8)
        self._grid_box.write(_encode_array(grid, step, stamp_ns), stamp_ns)
        markers = viz.markers_from_output(out)
        if extra_markers:
            markers = markers + list(extra_markers)
        blob = json.dumps({"step": step, "stamp_ns": stamp_ns,
                           "grid_meta": self._grid_meta,
                           "markers": markers}).encode()
        self._markers_box.write(blob, stamp_ns)
        if self._overlay_box is not None and image is not None:
            over = viz.draw_boxes(np.asarray(image), out.boxes)
            over8 = np.clip(over, 0, 255).astype(np.uint8)
            self._overlay_box.write(_encode_array(over8, step, stamp_ns),
                                    stamp_ns)

    def close(self) -> None:
        self._grid_box.close()
        self._markers_box.close()
        if self._overlay_box is not None:
            self._overlay_box.close()

    def unlink(self) -> None:
        self._grid_box.unlink()
        self._markers_box.unlink()
        if self._overlay_box is not None:
            self._overlay_box.unlink()


class SessionFrame:
    """One coherent viewer poll result."""

    def __init__(self, grid=None, step=0, stamp_ns=0, markers=None,
                 overlay=None, grid_meta=None):
        self.grid = grid
        self.step = step
        self.stamp_ns = stamp_ns
        self.markers: List[dict] = markers or []
        self.overlay = overlay
        self.grid_meta: Optional[dict] = grid_meta


class SessionSubscriber:
    """Viewer-side poller. Attaches to an existing session by name; the
    grid channel is required, markers/overlay optional (a publisher with
    overlay=False simply never creates that mailbox)."""

    def __init__(self, session: str):
        self.session = session
        self._grid_box = native.ShmMailbox(
            native.shm_path(session, GRID_CHANNEL))
        self._markers_box = self._try_open(MARKERS_CHANNEL)
        self._overlay_box = self._try_open(OVERLAY_CHANNEL)
        self._grid_seq = 0

    def _try_open(self, channel: str):
        try:
            return native.ShmMailbox(native.shm_path(self.session, channel))
        except OSError:
            return None

    def poll(self, wait_new: bool = True) -> Optional[SessionFrame]:
        """Latest frame, or None if the grid channel has nothing new
        (wait_new=True) / nothing at all."""
        got = self._grid_box.read(
            min_seq=self._grid_seq if wait_new else 0)
        if got is None:
            return None
        data, _stamp, seq = got
        self._grid_seq = seq
        grid, step, stamp = _decode_grid(data)
        frame = SessionFrame(grid=grid, step=step, stamp_ns=stamp)
        if self._markers_box is not None:
            m = self._markers_box.read()
            if m is not None:
                try:
                    doc = json.loads(m[0])
                    frame.markers = doc.get("markers", [])
                    frame.grid_meta = doc.get("grid_meta")
                except json.JSONDecodeError:
                    pass  # torn JSON can't happen (seqlock), but be total
        if self._overlay_box is not None:
            o = self._overlay_box.read()
            if o is not None:
                frame.overlay = _decode_overlay(o[0])[0]
        return frame

    def close(self) -> None:
        self._grid_box.close()
        for b in (self._markers_box, self._overlay_box):
            if b is not None:
                b.close()
