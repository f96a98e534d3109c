"""Per-stage latency telemetry: the reference's tick timers, honestly.

The reference logs three wall-clock stage timers every tick at INFO —
2D detection ms (src/grid_vision_node.cpp:125-135), vision-orientation
ms (:192-202), PCA estimation ms (:212-224). The production TPU path
deliberately fuses everything into ONE dispatch (per-stage timing is
impossible without breaking the fusion), so this module provides the
observability mode: the same pipeline split at the reference's two
timer boundaries into three jits, each synced with a scalar readback.

Numbers include the per-dispatch link round trip (so they are honest
"what would this stage cost standalone" figures, like the reference's
cudaStreamSynchronize-bracketed timers); the fused single-dispatch
step remains the deployment path. CLI: `run --timings`.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .. import pipeline
from ..config import GridVisionConfig
from ..geometry import intrinsic_matrix
from ..types import Extrinsics, GridState, Obs


@dataclasses.dataclass
class StageTimes:
    detect_ms: float
    pose_ms: float
    fuse_ms: float

    def __str__(self):
        name = "vision orientation/pose"
        return (f"2D detection: {self.detect_ms:.2f} ms; "
                f"{name}: {self.pose_ms:.2f} ms; "
                f"association+grid: {self.fuse_ms:.2f} ms")


class TimedEngine:
    """Three-dispatch variant of pipeline.Engine for stage telemetry."""

    def __init__(self, engine: pipeline.Engine):
        self.engine = engine
        cfg = engine.cfg

        self._detect = jax.jit(functools.partial(
            pipeline.detect_with_stats, cfg=cfg))

        def poses_stage(params, obs, boxes, rng):
            # the SAME has_image gate fuse applies on entry (Q1: a
            # stale/absent camera must not produce phantom poses)
            boxes = boxes.__class__(
                xyxy=boxes.xyxy, confidence=boxes.confidence,
                label=boxes.label, valid=boxes.valid & obs.has_image)
            K = intrinsic_matrix(cfg.fx, cfg.fy, cfg.cx, cfg.cy)
            return pipeline.pose_branch(params, obs, boxes, K, rng,
                                        engine.extrinsics, cfg)

        self._poses = jax.jit(poses_stage)
        self._fuse = jax.jit(functools.partial(pipeline.fuse, cfg=cfg),
                             donate_argnums=(1,))

    def step(self, state: GridState, obs: Obs):
        """(state', out, StageTimes). The pose stage consumes the same
        rng stream fuse would split, so results match the fused step up
        to the staged-dispatch boundaries."""
        eng = self.engine

        t0 = time.perf_counter()
        boxes, overflow = self._detect(eng.params, obs.image)
        _sync(boxes.confidence)
        t1 = time.perf_counter()
        rng, _ = jax.random.split(state.rng)
        poses_cam, trunc = self._poses(eng.params, obs, boxes, rng)
        _sync(poses_cam.position)
        t2 = time.perf_counter()
        state, out = self._fuse(eng.params, state, obs, boxes,
                                eng.extrinsics, poses_cam=poses_cam,
                                prenms_overflow=overflow,
                                box_cloud_truncated=trunc)
        _sync(state.log_odds)
        t3 = time.perf_counter()
        return state, out, StageTimes(
            detect_ms=(t1 - t0) * 1e3, pose_ms=(t2 - t1) * 1e3,
            fuse_ms=(t3 - t2) * 1e3)


def _sync(arr) -> None:
    """Scalar readback (block_until_ready is async on the tunnel)."""
    _ = float(np.asarray(jax.device_get(arr.reshape(-1)[0])))
