"""Failure detection / graceful degradation helpers.

The reference's failure philosophy is local try/catch + log-and-continue
(SURVEY §5: cv_bridge, ORT, TF2, RANSAC all degrade without crashing).
The jitted engine is total by construction (masked no-ops instead of
exceptions); what remains is host-side input validation and numeric
health monitoring, which lives here.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..types import GridState, Obs

logger = logging.getLogger("grid_vision_tpu")


class InputError(ValueError):
    """Raised by validate_obs for malformed host inputs."""


def validate_obs(obs: Obs, cfg) -> None:
    """Host-side ingest validation (the cv_bridge/fromROSMsg failure
    surface): shape/dtype checks before anything hits the device."""
    h, w = cfg.camera_image_height, cfg.camera_image_width
    if obs.image.shape != (h, w, 3):
        raise InputError(
            f"image shape {obs.image.shape} != configured ({h}, {w}, 3)")
    if obs.cloud.xyz.shape != (cfg.max_points, 3):
        raise InputError(
            f"cloud capacity {obs.cloud.xyz.shape[0]} != configured "
            f"{cfg.max_points} (repack with the right capacity)")


@dataclasses.dataclass
class HealthReport:
    step: int
    finite: bool
    lo_min: float
    lo_max: float
    occupied_cells: int

    @property
    def ok(self) -> bool:
        return self.finite


def check_state(state: GridState) -> HealthReport:
    """Numeric health of the persistent state (the engine's only mutable
    surface). Device->host sync: call at a monitoring cadence, not every
    step."""
    lo = np.asarray(state.log_odds)
    report = HealthReport(
        step=int(state.step),
        finite=bool(np.isfinite(lo).all()),
        lo_min=float(lo.min()),
        lo_max=float(lo.max()),
        occupied_cells=int((lo > 0).sum()),
    )
    if not report.ok:
        logger.error("non-finite grid state at step %d", report.step)
    return report


def recover_state(state: GridState, cfg) -> GridState:
    """Elastic recovery: replace non-finite cells with the prior (the
    reference's equivalent was a process restart = full reset; this
    keeps the healthy cells)."""
    lo = jnp.where(jnp.isfinite(state.log_odds), state.log_odds,
                   cfg.log_odds_prior)
    occ = 1.0 / (1.0 + jnp.exp(-jnp.clip(lo, cfg.min_log_odds,
                                         cfg.max_log_odds)))
    return GridState(log_odds=lo, occupancy=occ, rng=state.rng,
                     step=state.step)
