"""PCA L-shape pose estimation over per-box sub-clouds.

TPU re-design of bboxPoseEstimation + computePCABoundingBox
(src/cloud_detections.cpp:140-247) as fully vmapped closed-form math:

  - pcl::RadiusOutlierRemoval (r=0.4, min 10 neighbors, :150-154) becomes
    a masked pairwise-distance neighbor count per box (capacity-bounded
    sub-clouds come from association.gather_box_clouds);
  - cv::PCA over (z, x) rows (:187-201) becomes the closed-form 2x2
    eigendecomposition: theta = atan2(2*cxy, cxx - cyy) / 2 gives the
    major axis; eigenvector sign is canonicalized major.x >= 0 (OpenCV's
    sign is unspecified — sign flips the angle by pi but leaves
    length/width and the rasterized footprint identical);
  - extents from min/max projections (:203-218);
  - quirk Q4 preserved: the yaw angle is computed in DEGREES (:227) and
    fed to setRPY, which expects radians (:236) — we reproduce the same
    wrong-units quaternion;
  - position remap (:230-232): (center.y, centroid_y, center.x), i.e.
    pose.x = mean lateral (camera x), pose.z = mean depth (camera z),
    pose.y = 3D centroid's camera y (:181);
  - height is never assigned in the reference's PCA path (uninitialized
    C++ member); we define it as 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..types import LShapePoses


def radius_outlier_mask(pts: jnp.ndarray, valid: jnp.ndarray,
                        radius: float, min_neighbors: int) -> jnp.ndarray:
    """Keep points with >= min_neighbors cloud points (self included)
    within `radius` (pcl::RadiusOutlierRemoval semantics)."""
    d2 = jnp.sum((pts[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
    near = (d2 <= radius * radius) & valid[None, :] & valid[:, None]
    counts = jnp.sum(near.astype(jnp.int32), axis=-1)
    return valid & (counts >= min_neighbors)


def _pca_pose_single(pts: jnp.ndarray, kept: jnp.ndarray):
    """One box: filtered camera-frame points -> pose components.

    Returns dict of (px, py, pz, length, width, angle_deg, valid).
    """
    w = kept.astype(jnp.float32)
    n = jnp.sum(w)
    safe_n = jnp.maximum(n, 1.0)

    centroid = jnp.sum(pts * w[:, None], axis=0) / safe_n      # 3D centroid
    data = jnp.stack([pts[:, 2], pts[:, 0]], axis=-1)          # (K, 2)=(z,x)
    mean = jnp.sum(data * w[:, None], axis=0) / safe_n
    d = (data - mean) * w[:, None]
    cov = d.T @ (data - mean) / safe_n                         # (2, 2)

    theta = 0.5 * jnp.arctan2(2.0 * cov[0, 1], cov[0, 0] - cov[1, 1])
    major = jnp.stack([jnp.cos(theta), jnp.sin(theta)])        # major.x >= 0
    minor = jnp.stack([-major[1], major[0]])
    flip = (minor[0] < 0) | ((minor[0] == 0) & (minor[1] < 0))
    minor = jnp.where(flip, -minor, minor)

    centered = data - mean
    proj_l = centered @ major
    proj_w = centered @ minor
    neg_inf, pos_inf = -jnp.inf, jnp.inf
    max_l = jnp.max(jnp.where(kept, proj_l, neg_inf))
    min_l = jnp.min(jnp.where(kept, proj_l, pos_inf))
    max_w = jnp.max(jnp.where(kept, proj_w, neg_inf))
    min_w = jnp.min(jnp.where(kept, proj_w, pos_inf))

    ok = n > 0
    length = jnp.where(ok, max_l - min_l, 0.0)
    width = jnp.where(ok, max_w - min_w, 0.0)
    angle_deg = jnp.arctan2(major[1], major[0]) * (180.0 / jnp.pi)
    return (mean[1], centroid[1], mean[0], length, width, angle_deg, ok)


def pca_lshape_poses(box_pts: jnp.ndarray, box_valid: jnp.ndarray,
                     labels: jnp.ndarray, radius: float,
                     min_neighbors: int) -> LShapePoses:
    """Vmapped PCA L-shape over all boxes.

    box_pts: (D, K, 3) camera-frame sub-clouds; box_valid: (D, K).
    Returns camera-frame LShapePoses (valid = box produced a pose, i.e.
    its filtered sub-cloud is non-empty — the reference's ``continue`` on
    empty data, :174-175).
    """
    kept = jax.vmap(radius_outlier_mask, in_axes=(0, 0, None, None))(
        box_pts, box_valid, radius, min_neighbors)
    px, py, pz, length, width, angle_deg, ok = jax.vmap(_pca_pose_single)(
        box_pts, kept)
    from ..geometry import quat_from_pitch
    quat = quat_from_pitch(angle_deg)   # degrees fed as radians (Q4)
    return LShapePoses(
        position=jnp.stack([px, py, pz], axis=-1),
        quat=quat,
        length=length,
        width=width,
        height=jnp.zeros_like(length),
        label=labels,
        valid=ok,
    )
