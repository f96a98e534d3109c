"""Bayesian log-odds occupancy grid updates (the reference's L1 layer).

TPU-first re-design of src/occupancy_grid.cpp:

  - The reference's per-cell GridMapIterator sigmoid loop
    (occupancy_grid.cpp:25-30/57-62/99-104) becomes one fused elementwise
    pass over the whole (H, W) array.
  - The reference's per-box Eigen ``block(...).array() += 0.85``
    (occupancy_grid.cpp:140-183) becomes a single rank-1-mask matmul:
    increment = hit * row_masks^T @ col_masks, which XLA tiles onto the
    MXU — all boxes rasterize in one op, no host loop, overlapping boxes
    accumulate exactly like repeated ``+=``.
  - Free space comes from the uniform decay, NOT raycast carving —
    quirk Q2: the reference declares log_odds_free_/-occupied_ but never
    uses them; there is no ray casting anywhere. An optional DDA raycast
    extension lives in raycast.py and is off in compat mode.

Update order (all three reference overloads share it): decay -> per-box
increments -> clamp to [min_log_odds, max_log_odds] -> sigmoid into the
occupancy layer. Note clamping happens only once, AFTER all boxes — so
overlapping boxes can exceed max_log_odds transiently, exactly like the
reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import GridVisionConfig
from ..geometry import grid_index_from_position
from ..taxonomy import estimated_depth
from ..types import Boxes, LShapePoses


def _finish(log_odds: jnp.ndarray, cfg: GridVisionConfig):
    """Clamp + log-odds -> probability (occupancy_grid.cpp:21-30)."""
    log_odds = jnp.clip(log_odds, cfg.min_log_odds, cfg.max_log_odds)
    occupancy = 1.0 / (1.0 + jnp.exp(-log_odds))
    return log_odds, occupancy


def decay_update(log_odds: jnp.ndarray, cfg: GridVisionConfig):
    """updateMap(grid) — decay-only overload (occupancy_grid.cpp:16-31)."""
    return _finish(log_odds + cfg.log_odds_decay, cfg)



def corner_window_counts(corners_xy: jnp.ndarray, box_valid: jnp.ndarray,
                         center, length, resolution: float,
                         n_rows: int, n_cols: int,
                         row0=0) -> jnp.ndarray:
    """(n_rows, n_cols) f32 count of valid axis-aligned footprint blocks
    covering each cell of a row window starting at global row `row0`.

    THE single rasterization primitive: the reference's
    updateGridCellsFast semantics (occupancy_grid.cpp:140-183 — a box is
    skipped entirely if ANY corner falls off the map, otherwise the full
    inclusive min..max index block counts) expressed as one rank-1-mask
    einsum. Shared by lshape_update/_block_increment (hit * counts),
    lshape_hit_counts (the shared-grid psum contribution), and
    parallel/city_grid.slab_hit_counts (row-sharded slabs) so the skip
    quirk and mask construction can never drift apart.
    """
    idx, corner_ok = grid_index_from_position(
        corners_xy, center, length, resolution)
    ok = box_valid & jnp.all(corner_ok, axis=-1)           # (D,)
    lo = jnp.min(idx, axis=-2)                              # (D, 2)
    hi = jnp.max(idx, axis=-2)                              # (D, 2)
    rows = jnp.arange(n_rows, dtype=jnp.int32) + row0
    cols = jnp.arange(n_cols, dtype=jnp.int32)
    row_mask = ((rows[None, :] >= lo[:, 0:1])
                & (rows[None, :] <= hi[:, 0:1])
                & ok[:, None]).astype(jnp.float32)
    col_mask = ((cols[None, :] >= lo[:, 1:2])
                & (cols[None, :] <= hi[:, 1:2])).astype(jnp.float32)
    return jnp.einsum("dh,dw->hw", row_mask, col_mask,
                      preferred_element_type=jnp.float32)


def pose_footprint_corners(poses: LShapePoses) -> jnp.ndarray:
    """(D, 4, 2) axis-aligned footprint corners from pose centers and
    length/width in base axes, IGNORING yaw (quirk Q11 —
    occupancy_grid.cpp:79-90)."""
    px = poses.position[:, 0]
    py = poses.position[:, 1]
    half_l = poses.length / 2.0
    half_w = poses.width / 2.0
    return jnp.stack([
        jnp.stack([px - half_l, py - half_w], axis=-1),
        jnp.stack([px + half_l, py - half_w], axis=-1),
        jnp.stack([px + half_l, py + half_w], axis=-1),
        jnp.stack([px - half_l, py + half_w], axis=-1),
    ], axis=-2)


def lshape_hit_counts(poses: LShapePoses,
                      cfg: GridVisionConfig) -> jnp.ndarray:
    """(H, W) f32 count of valid pose footprints covering each cell
    (the einsum rasterization WITHOUT decay/hit-scale/clamp) — the
    per-rig contribution the multi-rig shared-grid fusion psums over
    the mesh (parallel/shared_grid.py)."""
    h, w = cfg.grid_size
    return corner_window_counts(
        pose_footprint_corners(poses), poses.valid, cfg.grid_center,
        (float(cfg.grid_x), float(cfg.grid_y)), cfg.resolution, h, w)


def _block_increment(log_odds: jnp.ndarray,
                     corners_xy: jnp.ndarray,
                     box_valid: jnp.ndarray,
                     cfg: GridVisionConfig) -> jnp.ndarray:
    """Rasterize per-box axis-aligned index blocks as one MXU matmul.

    corners_xy: (D, 4, 2) base-frame footprint corners per box.
    box_valid: (D,) bool.
    Returns log_odds + hit * sum_d block_d, matching updateGridCellsFast
    (occupancy_grid.cpp:140-183): a box is skipped entirely if ANY corner
    falls off the map (:171-172); otherwise the full min..max index block
    (inclusive) gets += log_odds_hit.
    """
    h, w = cfg.grid_size
    increment = cfg.log_odds_hit * corner_window_counts(
        corners_xy, box_valid, cfg.grid_center,
        (float(cfg.grid_x), float(cfg.grid_y)), cfg.resolution, h, w)
    return log_odds + increment


def lshape_update(log_odds: jnp.ndarray, poses: LShapePoses,
                  cfg: GridVisionConfig):
    """updateMap(grid, bboxes_pose) — the live dynamic-object overload
    (occupancy_grid.cpp:65-105).

    Footprint corners are computed from position +- length/2 / +- width/2
    in base axes, IGNORING the estimated yaw (quirk Q11: orientation
    affects markers, not the grid).
    """
    log_odds = log_odds + cfg.log_odds_decay
    log_odds = _block_increment(log_odds, pose_footprint_corners(poses),
                                poses.valid, cfg)
    return _finish(log_odds, cfg)


def point_bbox_update(log_odds: jnp.ndarray, base_points: jnp.ndarray,
                      boxes: Boxes, cfg: GridVisionConfig):
    """updateMap(grid, base_points, bboxes) — per-class footprint overload
    (occupancy_grid.cpp:33-63 + computeBoundingBox3D :107-138).

    Dead code in the reference node (quirk Q6: never called), provided for
    API parity. The footprint is a square extending +estimated_depth
    forward of the point and +-depth/2 laterally; classes without an
    estimated depth get -1.0, which still rasterizes a (small, backwards)
    block exactly like the reference would.
    """
    log_odds = log_odds + cfg.log_odds_decay
    depth = estimated_depth(boxes.label)                     # (D,)
    bx = base_points[:, 0]
    by = base_points[:, 1]
    corners = jnp.stack([
        jnp.stack([bx + depth, by + depth / 2.0], axis=-1),
        jnp.stack([bx + depth, by - depth / 2.0], axis=-1),
        jnp.stack([bx, by - depth / 2.0], axis=-1),
        jnp.stack([bx, by + depth / 2.0], axis=-1),
    ], axis=-2)
    log_odds = _block_increment(log_odds, corners, boxes.valid, cfg)
    return _finish(log_odds, cfg)


def yaw_from_quat(quat: jnp.ndarray) -> jnp.ndarray:
    """Base-frame z-yaw of (..., 4) xyzw quaternions."""
    x, y, z, w = (quat[..., i] for i in range(4))
    return jnp.arctan2(2.0 * (w * z + x * y),
                       1.0 - 2.0 * (y * y + z * z))


def lshape_update_oriented(log_odds: jnp.ndarray, poses: LShapePoses,
                           cfg: GridVisionConfig):
    """Extension: rotated-rectangle footprints (fixes quirk Q11 — the
    reference rasterizes axis-aligned min/max blocks regardless of the
    estimated yaw, occupancy_grid.cpp:74-90, 140-183).

    A cell is hit when its center lies inside the pose's yaw-rotated
    length x width rectangle. Box validity keeps the reference's
    any-off-map-corner skip, applied to the ROTATED corners.
    """
    h, w = cfg.grid_size
    length = (float(cfg.grid_x), float(cfg.grid_y))
    log_odds = log_odds + cfg.log_odds_decay

    yaw = yaw_from_quat(poses.quat)                           # (D,)
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    px = poses.position[:, 0]
    py = poses.position[:, 1]
    hl = poses.length / 2.0
    hw = poses.width / 2.0

    # rotated corners for the validity check
    cu = jnp.stack([hl, hl, -hl, -hl], -1)                    # (D, 4)
    cv = jnp.stack([hw, -hw, hw, -hw], -1)
    corners = jnp.stack([px[:, None] + c[:, None] * cu - s[:, None] * cv,
                         py[:, None] + s[:, None] * cu + c[:, None] * cv],
                        axis=-1)                              # (D, 4, 2)
    _, corner_ok = grid_index_from_position(corners, cfg.grid_center,
                                            length, cfg.resolution)
    ok = poses.valid & jnp.all(corner_ok, axis=-1)            # (D,)

    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    centers = _cell_centers(rows, cols, cfg)                  # (H, W, 2)
    rx = centers[None, ..., 0] - px[:, None, None]            # (D, H, W)
    ry = centers[None, ..., 1] - py[:, None, None]
    u = c[:, None, None] * rx + s[:, None, None] * ry
    v = -s[:, None, None] * rx + c[:, None, None] * ry
    inside = ((jnp.abs(u) <= hl[:, None, None])
              & (jnp.abs(v) <= hw[:, None, None])
              & ok[:, None, None])
    increment = cfg.log_odds_hit * jnp.sum(inside.astype(jnp.float32),
                                           axis=0)
    return _finish(log_odds + increment, cfg)


def _cell_centers(rows: jnp.ndarray, cols: jnp.ndarray,
                  cfg: GridVisionConfig) -> jnp.ndarray:
    from ..geometry import grid_position_from_index
    length = (float(cfg.grid_x), float(cfg.grid_y))
    return grid_position_from_index(
        jnp.stack([rows, cols], axis=-1), cfg.grid_center, length,
        cfg.resolution)


def export_occupancy_i8(occupancy: jnp.ndarray) -> jnp.ndarray:
    """nav_msgs/OccupancyGrid export: probability [0,1] -> int8 [0,100]
    (GridMapRosConverter::toOccupancyGrid(grid, "occupancy", 0.0, 1.0),
    grid_vision_node.cpp:270). NaN cells would map to -1 (unknown); our
    grid is total so none occur."""
    scaled = jnp.round(jnp.clip(occupancy, 0.0, 1.0) * 100.0)
    return scaled.astype(jnp.int8)
