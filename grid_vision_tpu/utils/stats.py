"""Per-step observability (the reference's only tracing was three wall
timers logged at INFO, src/grid_vision_node.cpp:125-135, 192-224 — here
every step gets structured stats plus optional jax.profiler traces)."""

from __future__ import annotations

import contextlib
import dataclasses
import logging
import time
from typing import Optional

logger = logging.getLogger("grid_vision_tpu")


@dataclasses.dataclass
class StepStats:
    step: int
    dispatch_s: float = 0.0
    boxes_kept: Optional[int] = None
    poses_valid: Optional[int] = None
    cells_occupied: Optional[int] = None
    # Host-side ingest saturation: finite cloud points dropped by the
    # capacity subsample (device-side counters live in
    # types.SaturationStats, carried by StepOutput).
    cloud_points_dropped: int = 0

    def log(self) -> None:
        logger.info(
            "step=%d dispatch=%.3fms boxes=%s poses=%s occ_cells=%s",
            self.step, self.dispatch_s * 1e3, self.boxes_kept,
            self.poses_valid, self.cells_occupied)


@contextlib.contextmanager
def stage_timer(name: str):
    """The reference's start/end chrono pattern as a context manager."""
    t0 = time.perf_counter()
    yield
    logger.info("%s took %.2f ms", name, (time.perf_counter() - t0) * 1e3)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace wrapper — open with TensorBoard/Perfetto."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
