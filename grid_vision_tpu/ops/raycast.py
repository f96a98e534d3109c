"""Raycast free-space carving — the extension the reference declares but
never implements.

The reference declares log_odds_free_ = -0.4 and log_odds_occupied_ = 1.2
(occupancy_grid.hpp:25-26) yet never uses them: free space emerges only
from uniform decay (quirk Q2). This module implements the missing
capability TPU-style: instead of a sequential per-ray DDA walk, every
ray is sampled at S evenly spaced points (S chosen so the sample step is
finer than a cell), all P x S samples are binned to grid cells in one
shot, and a scatter-max builds the carve mask — one cell is carved at
most once per scan regardless of how many rays cross it (octomap-style
"mark free once per update").

Enabled via GridVisionConfig(raycast_free_space=True, compat=False);
bit-compat mode must keep it off.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import GridVisionConfig
from ..geometry import grid_index_from_position
from ..types import LShapePoses
from . import rasterize


def default_samples(cfg: GridVisionConfig) -> int:
    """Sample count giving a step <= one cell along the longest possible
    in-map ray (the grid diagonal) — the dense-sampling equivalent of an
    exact DDA walk (corner-clipped cells may still be skipped)."""
    diag = (cfg.grid_x ** 2 + cfg.grid_y ** 2) ** 0.5
    return int(diag / cfg.resolution) + 8


def carve_mask(origin_xy: jnp.ndarray, points_xy: jnp.ndarray,
               valid: jnp.ndarray, cfg: GridVisionConfig,
               n_samples: int | None = None) -> jnp.ndarray:
    """(H, W) float mask: 1 where a sensor ray crossed the cell.

    origin_xy: (2,) sensor position in base frame; points_xy: (P, 2) ray
    endpoints in base frame; valid: (P,). The endpoint's own cell is
    never carved (it holds the hit evidence).
    """
    if n_samples is None:
        n_samples = default_samples(cfg)
    h, w = cfg.grid_size
    length = (float(cfg.grid_x), float(cfg.grid_y))
    frac = (jnp.arange(n_samples, dtype=jnp.float32) + 0.5) / n_samples
    # (P, S, 2) sample points strictly inside (origin, endpoint)
    samples = origin_xy[None, None, :] + frac[None, :, None] * (
        points_xy[:, None, :] - origin_xy[None, None, :])
    idx, ok = grid_index_from_position(samples, cfg.grid_center, length,
                                       cfg.resolution)
    end_idx, end_ok = grid_index_from_position(points_xy, cfg.grid_center,
                                               length, cfg.resolution)
    not_end = ~jnp.all(idx == end_idx[:, None, :], axis=-1) | ~end_ok[:, None]
    use = ok & not_end & valid[:, None]
    ix = jnp.where(use, idx[..., 0], 0).reshape(-1)
    iy = jnp.where(use, idx[..., 1], 0).reshape(-1)
    val = use.astype(jnp.float32).reshape(-1)
    mask = jnp.zeros((h, w), jnp.float32)
    return mask.at[ix, iy].max(val)


def lshape_update_with_carving(log_odds: jnp.ndarray, poses: LShapePoses,
                               origin_xy: jnp.ndarray,
                               points_xy: jnp.ndarray,
                               points_valid: jnp.ndarray,
                               cfg: GridVisionConfig,
                               log_odds_free: float = -0.4,
                               n_samples: int | None = None):
    """Extension-mode grid update: decay + raycast free carving + box
    hits -> clamp -> sigmoid. Uses the reference's declared-but-unused
    free constant by default."""
    carve = carve_mask(origin_xy, points_xy, points_valid, cfg, n_samples)
    log_odds = log_odds + log_odds_free * carve
    return rasterize.lshape_update(log_odds, poses, cfg)
