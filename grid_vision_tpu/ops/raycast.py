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
import jax

from ..geometry import grid_index_from_position, grid_position_from_index
from ..types import LShapePoses
from . import rasterize


def default_samples(cfg: GridVisionConfig) -> int:
    """Sample count giving a step <= one cell along the longest possible
    in-map ray (the grid diagonal) — the dense-sampling equivalent of an
    exact DDA walk (corner-clipped cells may still be skipped)."""
    diag = (cfg.grid_x ** 2 + cfg.grid_y ** 2) ** 0.5
    return int(diag / cfg.resolution) + 8


def carve_mask_sampled(origin_xy: jnp.ndarray, points_xy: jnp.ndarray,
                       valid: jnp.ndarray, cfg: GridVisionConfig,
                       n_samples: int | None = None) -> jnp.ndarray:
    """Exact per-ray-line carve: dense samples along each ray scattered
    to cells. Reference semantics for tests; O(P * S) scatter updates
    make it slow on TPU — use carve_mask (polar) in production."""
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


def range_profile(origin_xy: jnp.ndarray, points_xy: jnp.ndarray,
                  valid: jnp.ndarray, n_bins: int = 4096) -> jnp.ndarray:
    """(n_bins,) per-angle-bin max endpoint range (the polar beam model's
    measurement profile): endpoints scatter-max into angle bins, then the
    profile is dilated +-2 bins (beam-width smoothing — scans sparser
    than the bin grid would otherwise leave striped gaps)."""
    rel = points_xy - origin_xy[None, :]
    r = jnp.sqrt(rel[:, 0] * rel[:, 0] + rel[:, 1] * rel[:, 1])
    theta = jnp.arctan2(rel[:, 1], rel[:, 0])
    pbin = jnp.clip(((theta + jnp.pi) * (n_bins / (2.0 * jnp.pi)))
                    .astype(jnp.int32), 0, n_bins - 1)
    ranges = jnp.zeros((n_bins,), jnp.float32).at[pbin].max(
        jnp.where(valid, r, 0.0))
    bin_dilation = 2
    return jnp.max(jnp.stack(
        [jnp.roll(ranges, s) for s in range(-bin_dilation,
                                            bin_dilation + 1)]), axis=0)


def cell_polar_maps(origin_xy: jnp.ndarray, cfg: GridVisionConfig,
                    n_bins: int = 4096):
    """Per-cell polar geometry: ((H, W) int32 angle-bin index, (H, W)
    f32 range of the cell center from the origin). Shared by the XLA
    carve and the fused Pallas kernel (ops/pallas_raycast.py) — their
    bit-equality depends on both consuming these identical maps."""
    h, w = cfg.grid_size
    length = (float(cfg.grid_x), float(cfg.grid_y))
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    centers = grid_position_from_index(
        jnp.stack([rows, cols], axis=-1), cfg.grid_center, length,
        cfg.resolution)
    crel = centers - origin_xy
    ctheta = jnp.arctan2(crel[..., 1], crel[..., 0])
    cbin = jnp.clip(((ctheta + jnp.pi) * (n_bins / (2.0 * jnp.pi)))
                    .astype(jnp.int32), 0, n_bins - 1)
    cr = jnp.sqrt(crel[..., 0] * crel[..., 0]
                  + crel[..., 1] * crel[..., 1])
    return cbin, cr


def cell_range_map(ranges: jnp.ndarray, origin_xy: jnp.ndarray,
                   cfg: GridVisionConfig) -> jnp.ndarray:
    """(H, W) measured beam range at each cell's angle bin (one gather
    from the polar profile)."""
    cbin, _ = cell_polar_maps(origin_xy, cfg, ranges.shape[0])
    return ranges[cbin]


def carve_mask(origin_xy: jnp.ndarray, points_xy: jnp.ndarray,
               valid: jnp.ndarray, cfg: GridVisionConfig,
               n_bins: int = 4096) -> jnp.ndarray:
    """(H, W) float mask: 1 where a sensor ray crossed the cell.

    origin_xy: (2,) sensor position in base frame; points_xy: (P, 2) ray
    endpoints in base frame; valid: (P,). The endpoint's own cell is
    never carved (it holds the hit evidence; guarded by a one-cell
    range margin).

    TPU-first polar beam model: endpoints scatter-max their range into
    ``n_bins`` angle bins (one small scatter over P points), then every
    cell is carved iff its own (angle-bin, range) lies strictly inside
    the bin's measured range — O(P + H*W) instead of the O(P * S)
    per-sample scatter of carve_mask_sampled. At 4096 bins the angular
    resolution (0.088 deg) is finer than one cell subtends anywhere on
    the default 50 m grid.
    """
    ranges = range_profile(origin_xy, points_xy, valid, n_bins)
    cbin, cr = cell_polar_maps(origin_xy, cfg, n_bins)
    cell_range = ranges[cbin]                                # (H, W)
    # Strictly inside the beam: farther than 0, closer than the endpoint
    # by at least one cell diagonal (protects the endpoint's own cell).
    margin = cfg.resolution * 1.5
    return ((cr < cell_range - margin) & (cell_range > 0)).astype(
        jnp.float32)


def lshape_update_with_carving(log_odds: jnp.ndarray, poses: LShapePoses,
                               origin_xy: jnp.ndarray,
                               points_xy: jnp.ndarray,
                               points_valid: jnp.ndarray,
                               cfg: GridVisionConfig,
                               log_odds_free: float = -0.4):
    """Extension-mode grid update: decay + raycast free carving + box
    hits -> clamp -> sigmoid. Uses the reference's declared-but-unused
    free constant by default.

    grid_backend="pallas" routes to the fused single-pass kernel
    (ops/pallas_raycast.py, bit-equal); default is this XLA chain."""
    if cfg.grid_backend == "pallas":
        from .pallas_raycast import lshape_update_with_carving_pallas
        return lshape_update_with_carving_pallas(
            log_odds, poses, origin_xy, points_xy, points_valid, cfg,
            log_odds_free)
    ranges = range_profile(origin_xy, points_xy, points_valid)
    cbin, cr = cell_polar_maps(origin_xy, cfg)
    return carve_update_from_maps(log_odds, poses, ranges, cbin, cr,
                                  cfg, log_odds_free)


def carve_update_from_maps(log_odds: jnp.ndarray, poses: LShapePoses,
                           ranges: jnp.ndarray, cbin: jnp.ndarray,
                           cr: jnp.ndarray, cfg: GridVisionConfig,
                           log_odds_free: float = -0.4):
    """XLA carve+update from precomputed polar maps — the reference the
    fused Pallas kernel is bit-equality-tested against (both consume the
    same concrete maps, removing cross-program fusion/FMA ambiguity in
    the map computation itself)."""
    cell_range = ranges[cbin]
    margin = cfg.resolution * 1.5
    carve = ((cr < cell_range - margin) & (cell_range > 0)).astype(
        jnp.float32)
    log_odds = log_odds + log_odds_free * carve
    return rasterize.lshape_update(log_odds, poses, cfg)
