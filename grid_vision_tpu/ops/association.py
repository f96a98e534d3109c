"""LiDAR<->camera association ops (the reference's L2 layer).

TPU re-design of src/cloud_detections.cpp's point-loop algorithms as
fixed-shape masked tensor ops:

  - buildKDTree + computeDepthForBoundingBoxes (:8-87): the FLANN KD-tree
    k-NN becomes a brute-force (D, P) squared-distance matrix + top-k.
    Exact k-NN over ~16k points x ~64 boxes is a tiny matmul-shaped op on
    TPU — no tree needed, and it preserves the reference's *3D* metric
    quirk: the tree stores (u, v, depth) and the query has z=0, so depth^2
    participates in the distance.
  - extractCloudPerBBox (:249-298): the per-point "first containing bbox"
    loop becomes a (P, D) containment matrix + first-true-index reduction
    (preserving the ``break`` semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import GridVisionConfig
from ..types import Boxes, PointCloud
from ..geometry import project_points


def project_cloud_to_image(cloud: PointCloud, K: jnp.ndarray):
    """The buildKDTree projection (cloud_detections.cpp:13-33): camera-
    frame points with z > 0 -> (u, v, depth) with a validity mask.

    Returns (uvd (P, 3), valid (P,)).
    """
    u, v, depth = project_points(cloud.xyz, K)
    valid = cloud.mask() & (cloud.xyz[:, 2] > 0.0)
    uvd = jnp.stack([u, v, depth], axis=-1)
    # Park invalid rows far away so they never win a nearest-neighbor
    # search (the reference simply doesn't insert them).
    uvd = jnp.where(valid[:, None], uvd, PointCloud.PAD_SENTINEL)
    return uvd, valid


def knn_median_depth(uvd: jnp.ndarray, uvd_valid: jnp.ndarray,
                     boxes: Boxes, k: int):
    """computeDepthForBoundingBoxes (cloud_detections.cpp:43-87).

    For each box center (cx, cy, 0): k nearest (u, v, depth) points under
    the full 3D metric (depth included — see module docstring), then the
    ``nth_element`` upper median of their depths: sorted_depths[n // 2]
    where n = number of neighbors actually found (n = min(k, #points)).
    Boxes get -1.0 when the projected cloud is empty, matching the
    reference's preallocated default (:49).

    Returns (D,) float32 depths.
    """
    centers = boxes.centers()                                  # (D, 2)
    d2 = (jnp.sum((centers[:, None, :] - uvd[None, :, :2]) ** 2, axis=-1)
          + uvd[None, :, 2] ** 2)                              # (D, P)
    d2 = jnp.where(uvd_valid[None, :], d2, jnp.inf)
    # k iterative argmin passes instead of lax.top_k: top_k sorts the
    # whole 8k-point axis per box; k cheap reduction passes are faster
    # on TPU for the small k_near values in play (4-10). The loop is
    # UNROLLED (python for, k is static) rather than lax.scan: a scan
    # would carry the masked (D, P) matrix through HBM every pass, while
    # the unrolled chain lets XLA fuse the masking into recomputation.
    cols = jnp.arange(d2.shape[1], dtype=jnp.int32)
    cur = d2
    vals, idxs = [], []
    for _ in range(k):
        j = jnp.argmin(cur, axis=-1)                           # (D,)
        vals.append(jnp.take_along_axis(cur, j[:, None], axis=-1)[:, 0])
        idxs.append(j)
        cur = jnp.where(cols[None, :] == j[:, None], jnp.inf, cur)
    neg_d2 = -jnp.stack(vals, axis=-1)                         # (D, k)
    idx = jnp.stack(idxs, axis=-1).astype(jnp.int32)           # (D, k)
    neighbor_ok = jnp.isfinite(neg_d2)
    n_found = jnp.sum(neighbor_ok.astype(jnp.int32), axis=-1)  # (D,)
    depths = jnp.take_along_axis(
        jnp.broadcast_to(uvd[None, :, 2], d2.shape), idx, axis=-1)
    depths = jnp.where(neighbor_ok, depths, jnp.inf)
    depths_sorted = jnp.sort(depths, axis=-1)
    mid = jnp.clip(n_found // 2, 0, k - 1)
    median = jnp.take_along_axis(depths_sorted, mid[:, None], axis=-1)[:, 0]
    return jnp.where(n_found > 0, median, -1.0)


def knn_median_depth_approx(uvd: jnp.ndarray, uvd_valid: jnp.ndarray,
                            boxes: Boxes, k: int):
    """knn_median_depth via the TPU-accelerated partial-reduction top-k
    (jax.lax.approx_min_k, recall_target 0.99 -> measured 99.4% identical
    medians, 2x faster than the exact argmin chain at 8k points).

    Safe to substitute for the exact search in throughput deployments:
    the resulting depth feeds ONLY the static-object marker positions —
    static detections never touch the occupancy grid (quirk Q6,
    src/grid_vision_node.cpp:145-235), so grid parity is unaffected by
    neighbor recall. Select with cfg.knn_backend = "approx".
    """
    centers = boxes.centers()                                  # (D, 2)
    d2 = (jnp.sum((centers[:, None, :] - uvd[None, :, :2]) ** 2, axis=-1)
          + uvd[None, :, 2] ** 2)                              # (D, P)
    d2 = jnp.where(uvd_valid[None, :], d2, jnp.inf)
    vals, idx = jax.lax.approx_min_k(d2, k, recall_target=0.99)
    neighbor_ok = jnp.isfinite(vals)
    n_found = jnp.sum(neighbor_ok.astype(jnp.int32), axis=-1)  # (D,)
    depths = jnp.take_along_axis(
        jnp.broadcast_to(uvd[None, :, 2], d2.shape), idx, axis=-1)
    depths = jnp.where(neighbor_ok, depths, jnp.inf)
    depths_sorted = jnp.sort(depths, axis=-1)
    mid = jnp.clip(n_found // 2, 0, k - 1)
    median = jnp.take_along_axis(depths_sorted, mid[:, None], axis=-1)[:, 0]
    return jnp.where(n_found > 0, median, -1.0)


def assign_points_to_boxes(xyz_cam: jnp.ndarray, point_valid: jnp.ndarray,
                           K: jnp.ndarray, boxes: Boxes,
                           image_w: int, image_h: int):
    """extractCloudPerBBox (cloud_detections.cpp:249-298).

    Eligibility (:262-277): finite point, z > 0.001, projects inside
    [0, w) x [0, h). Assignment: the FIRST valid box whose pixel-space
    rectangle contains (u, v) inclusively (:280-288, ``break`` on match).

    Returns (assignment (P,) int32 box index or -1, u (P,), v (P,)).
    """
    u, v, _ = project_points(xyz_cam, K)
    eligible = (point_valid
                & jnp.all(jnp.isfinite(xyz_cam), axis=-1)
                & (xyz_cam[:, 2] > 0.001)
                & (u >= 0) & (u < image_w) & (v >= 0) & (v < image_h))
    inside = ((u[:, None] >= boxes.xyxy[None, :, 0])
              & (u[:, None] <= boxes.xyxy[None, :, 2])
              & (v[:, None] >= boxes.xyxy[None, :, 1])
              & (v[:, None] <= boxes.xyxy[None, :, 3])
              & boxes.valid[None, :]
              & eligible[:, None])                             # (P, D)
    any_match = jnp.any(inside, axis=-1)
    first = jnp.argmax(inside, axis=-1).astype(jnp.int32)      # first True
    return jnp.where(any_match, first, -1), u, v


def gather_box_clouds(xyz_cam: jnp.ndarray, assignment: jnp.ndarray,
                      num_boxes: int, capacity: int):
    """Materialize per-box sub-clouds at a fixed capacity.

    For each box d, gathers the first ``capacity`` assigned points in
    cloud order (the reference keeps all points in encounter order; we
    cap — callers can read ``truncated`` to see if the cap ever bound).

    Returns (points (D, capacity, 3), valid (D, capacity), truncated (D,)).
    """
    p = xyz_cam.shape[0]
    in_box = assignment[None, :] == jnp.arange(num_boxes,
                                               dtype=jnp.int32)[:, None]
    # Score = descending by cloud order among members; top_k picks the
    # first `capacity` members (stable in original order).
    order_score = jnp.where(in_box, p - jnp.arange(p, dtype=jnp.int32)[None, :], 0)
    score, idx = jax.lax.top_k(order_score, capacity)          # (D, cap)
    valid = score > 0
    pts = xyz_cam[idx]                                         # (D, cap, 3)
    pts = jnp.where(valid[..., None], pts, 0.0)
    counts = jnp.sum(in_box.astype(jnp.int32), axis=-1)
    truncated = counts > capacity
    return pts, valid, truncated


def count_assigned(assignment: jnp.ndarray, num_boxes: int) -> jnp.ndarray:
    in_box = assignment[None, :] == jnp.arange(num_boxes,
                                               dtype=jnp.int32)[:, None]
    return jnp.sum(in_box.astype(jnp.int32), axis=-1)
