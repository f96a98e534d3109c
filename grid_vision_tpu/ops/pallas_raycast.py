"""Pallas TPU kernel: fused raycast carve + occupancy-grid update.

Fuses the whole extension-mode L1 update (raycast.lshape_update_with_
carving) into ONE pass over the grid: per (BLOCK_H, W) tile the kernel
resolves each cell's measured beam range from the VMEM-resident polar
range profile, carves free space, applies decay, box hits, clamp and
sigmoid, and writes both layers — one read + two writes per cell, where
the XLA chain materializes the carve mask, the carved log-odds and the
decayed grid as separate HBM round trips.

The gather `ranges[cbin]` has no vector-gather primitive on the TPU VPU
(XLA lowers it through slow scalar paths); here it is factored as
cbin = hi*64 + lo over the range table reshaped to (64, 64): two
64-wide one-hot masks per cell (128 compares instead of 4096) and one
MXU matmul `onehot_hi @ table` followed by a masked lane reduction —
exact in f32 (each sum touches exactly one table entry plus zeros).

Bit-equality with the XLA path holds because both consume the identical
`range_profile` + `cell_polar_maps` arrays (computed once in XLA — the
scatter-max over P points is cheap and Pallas has no efficient scatter)
and replicate the same f32 op order; tests/test_pallas_raycast.py
asserts it cell-for-cell, like tests/test_pallas_grid.py does for the
hit-only kernel.

Known limitation: under `jax.vmap` (a batched rig fleet) the lifted
kernel's grid gains a sequential rig dimension and measured
pathologically slow on this machine's tunnel-attached chip — keep the
XLA chain for vmapped fleets (pipeline dispatches the fused kernel only
through grid_backend="pallas", and the fleet bench runs compat mode
where carving is off anyway); the fused kernel is the single-rig
serving-path win (0.27 vs 0.67 ms per carve+update, bit-equal).

Reference chain being fused (for parity bookkeeping): decay + per-box
block += + clamp + sigmoid sweeps of occupancy_grid.cpp:65-105 plus the
free-space constants it declares but never uses (occupancy_grid.hpp:
25-26, quirk Q2 — carving is the declared-missing capability).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import GridVisionConfig
from ..types import LShapePoses
from .pallas_grid import _box_index_ranges, _round_up
from .raycast import cell_polar_maps, range_profile

BLOCK_H = 16    # (BLOCK_H, W, 64) one-hot temps must fit VMEM
LANE = 128
BIN_SPLIT = 64  # n_bins = BIN_SPLIT * BIN_SPLIT


def _carve_grid_kernel(lo_x0_ref, hi_x0_ref, lo_x1_ref, hi_x1_ref,
                       ranges_ref, cbin_ref, cr_ref, log_odds_ref,
                       lo_out_ref, occ_out_ref, *,
                       decay: float, hit: float, free: float,
                       margin: float, lo_min: float, lo_max: float,
                       n_boxes: int, n_bins: int, block_h: int,
                       width: int):
    """One (block_h, width) tile: carve -> decay -> hits -> clamp ->
    sigmoid."""
    tile = pl.program_id(0)
    row0 = tile * block_h
    cbin = cbin_ref[:]                            # (block_h, width) i32
    cr = cr_ref[:]                                # (block_h, width) f32

    # Factored gather: cbin = hi*64 + lo over the (64, 64) range table.
    # hi = -1 on padded cells -> onehot_hi row is all-zero -> range 0.
    hi = cbin // BIN_SPLIT
    lo_i = cbin - hi * BIN_SPLIT
    lanes = jax.lax.broadcasted_iota(
        jnp.int32, (block_h, width, BIN_SPLIT), 2)
    onehot_hi = (hi[:, :, None] == lanes).astype(jnp.float32)
    onehot_lo = (lo_i[:, :, None] == lanes).astype(jnp.float32)
    table = ranges_ref[:]                         # (64, 64)
    # T[h, w, l] = table[hi[h, w], l]  (one MXU matmul)
    # HIGHEST precision: the multi-pass bf16 decomposition is exact here
    # because one operand is exactly-representable 0/1 and each output
    # sums a single table entry plus zeros (verified bit-equal on
    # hardware against the XLA gather).
    t = jax.lax.dot_general(
        onehot_hi, table, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    cell_range = jnp.sum(onehot_lo * t, axis=-1)  # (block_h, width)

    carve = ((cr < cell_range - margin) & (cell_range > 0.0)).astype(
        jnp.float32)
    acc = log_odds_ref[:] + free * carve
    acc = acc + decay

    rows = jax.lax.broadcasted_iota(jnp.int32, (block_h, width), 0) + row0
    cols = jax.lax.broadcasted_iota(jnp.int32, (block_h, width), 1)

    # Count covering boxes, then ONE hit*count add — the same op order
    # as the XLA einsum rasterizer (rasterize._block_increment), so
    # overlapping boxes stay bit-equal (sequential += hit differs by
    # ulps when k boxes cover a cell).
    def body(d, cnt):
        in_box = ((rows >= lo_x0_ref[d]) & (rows <= hi_x0_ref[d])
                  & (cols >= lo_x1_ref[d]) & (cols <= hi_x1_ref[d]))
        return cnt + in_box.astype(jnp.float32)

    cnt = jax.lax.fori_loop(0, n_boxes, body,
                            jnp.zeros((block_h, width), jnp.float32))
    acc = acc + hit * cnt
    acc = jnp.clip(acc, lo_min, lo_max)
    lo_out_ref[:] = acc
    occ_out_ref[:] = 1.0 / (1.0 + jnp.exp(-acc))


@functools.partial(jax.jit,
                   static_argnames=("cfg", "log_odds_free", "n_bins"))
def lshape_update_with_carving_pallas(log_odds: jnp.ndarray,
                                      poses: LShapePoses,
                                      origin_xy: jnp.ndarray,
                                      points_xy: jnp.ndarray,
                                      points_valid: jnp.ndarray,
                                      cfg: GridVisionConfig,
                                      log_odds_free: float = -0.4,
                                      n_bins: int = 4096):
    """Drop-in fused replacement for raycast.lshape_update_with_carving."""
    ranges = range_profile(origin_xy, points_xy, points_valid, n_bins)
    cbin, cr = cell_polar_maps(origin_xy, cfg, n_bins)
    return fused_carve_update(log_odds, poses, ranges, cbin, cr, cfg,
                              log_odds_free)


@functools.partial(jax.jit, static_argnames=("cfg", "log_odds_free"))
def fused_carve_update(log_odds: jnp.ndarray, poses: LShapePoses,
                       ranges: jnp.ndarray, cbin: jnp.ndarray,
                       cr: jnp.ndarray, cfg: GridVisionConfig,
                       log_odds_free: float = -0.4):
    """The fused kernel given precomputed polar maps (the bit-equality
    counterpart of raycast.carve_update_from_maps)."""
    h, w = cfg.grid_size
    hp = _round_up(h, BLOCK_H)
    wp = _round_up(w, LANE)
    n_boxes = poses.capacity
    n_bins = ranges.shape[0]
    if n_bins != BIN_SPLIT * BIN_SPLIT:
        raise ValueError(f"fused kernel needs n_bins == "
                         f"{BIN_SPLIT * BIN_SPLIT}, got {n_bins}")

    lo_x0, hi_x0, lo_x1, hi_x1 = _box_index_ranges(poses, cfg)
    # pad: cbin=-1 never matches a bin -> padded cells never carve
    cbin_p = jnp.full((hp, wp), -1, jnp.int32)
    cbin_p = jax.lax.dynamic_update_slice(cbin_p, cbin, (0, 0))
    cr_p = jnp.zeros((hp, wp), jnp.float32)
    cr_p = jax.lax.dynamic_update_slice(cr_p, cr, (0, 0))
    padded = jnp.zeros((hp, wp), jnp.float32)
    padded = jax.lax.dynamic_update_slice(padded, log_odds, (0, 0))

    kernel = functools.partial(
        _carve_grid_kernel, decay=cfg.log_odds_decay,
        hit=cfg.log_odds_hit, free=log_odds_free,
        margin=cfg.resolution * 1.5, lo_min=cfg.min_log_odds,
        lo_max=cfg.max_log_odds, n_boxes=n_boxes, n_bins=n_bins,
        block_h=BLOCK_H, width=wp)
    tile_spec = pl.BlockSpec((BLOCK_H, wp), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(hp // BLOCK_H,),
        in_specs=[
            pl.BlockSpec((BIN_SPLIT, BIN_SPLIT), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            tile_spec,
            tile_spec,
            tile_spec,
        ],
        out_specs=[tile_spec, tile_spec],
    )
    lo_out, occ_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(lo_x0, hi_x0, lo_x1, hi_x1,
      ranges.reshape(BIN_SPLIT, BIN_SPLIT), cbin_p, cr_p, padded)
    return lo_out[:h, :w], occ_out[:h, :w]
