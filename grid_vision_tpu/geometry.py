"""Camera + rigid-body + grid-index geometry (pure jnp, fully batched).

Replaces the reference's Eigen/TF2/grid_map math:
  - intrinsics K and K^-1       (object_detection.cpp:241-249)
  - pinhole projection          (cloud_detections.cpp:18-30, 267-273)
  - pixel -> 3D backprojection  (cloud_detections.cpp:89-103)
  - rigid cloud/point/pose transforms, replacing TF2 lookups
    (grid_vision_node.cpp:280-307, 337-382)
  - tf2::Quaternion::setRPY(0, -a, 0) used for all yaw quaternions
    (cloud_detections.cpp:236, vision_orientation.cpp:440)
  - grid_map position<->index conversion used by updateGridCellsFast
    (occupancy_grid.cpp:150-152)
"""

from __future__ import annotations

import jax.numpy as jnp


def intrinsic_matrix(fx, fy, cx, cy) -> jnp.ndarray:
    """K = [[fx,0,cx],[0,fy,cy],[0,0,1]] (object_detection.cpp:241-247)."""
    z = jnp.zeros(())
    o = jnp.ones(())
    return jnp.stack([
        jnp.stack([jnp.asarray(fx, jnp.float32), z, jnp.asarray(cx, jnp.float32)]),
        jnp.stack([z, jnp.asarray(fy, jnp.float32), jnp.asarray(cy, jnp.float32)]),
        jnp.stack([z, z, o]),
    ]).astype(jnp.float32)


def intrinsic_inverse(K: jnp.ndarray) -> jnp.ndarray:
    """K^-1 (object_detection.cpp:249 uses a generic Eigen inverse; for the
    pinhole K the closed form is exact and cheaper)."""
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    z = jnp.zeros(())
    o = jnp.ones(())
    return jnp.stack([
        jnp.stack([1.0 / fx, z, -cx / fx]),
        jnp.stack([z, 1.0 / fy, -cy / fy]),
        jnp.stack([z, z, o]),
    ]).astype(K.dtype)


def projection_matrix_3x4(fx, fy, cx, cy) -> jnp.ndarray:
    """The MultiBin solver's 3x4 projection [K | 0]
    (vision_orientation.cpp:19-20)."""
    K = intrinsic_matrix(fx, fy, cx, cy)
    return jnp.concatenate([K, jnp.zeros((3, 1), K.dtype)], axis=1)


def project_points(xyz: jnp.ndarray, K: jnp.ndarray):
    """Pinhole forward projection of camera-frame points.

    xyz: (..., 3) -> (u, v, z): each (...,). Matches the reference's
    ``img = K @ p; u = img.x/img.z`` (cloud_detections.cpp:19-24). No
    validity filtering here — callers apply their own z>0 / z>0.001 /
    in-image masks, which differ per call site.
    """
    img = xyz @ K.T
    z = img[..., 2]
    # The reference divides unconditionally; masked-out lanes may contain
    # inf/nan which callers must mask. Guard only against exact 0 to keep
    # grads/XLA happy.
    safe_z = jnp.where(z == 0, 1.0, z)
    u = img[..., 0] / safe_z
    v = img[..., 1] / safe_z
    return u, v, xyz[..., 2]


def pixel_to_3d(uv: jnp.ndarray, depth: jnp.ndarray,
                K_inv: jnp.ndarray) -> jnp.ndarray:
    """X_cam = depth * K^-1 [u, v, 1]^T (cloud_detections.cpp:89-103).

    uv: (..., 2), depth: (...,) -> (..., 3).
    """
    ones = jnp.ones_like(uv[..., :1])
    homog = jnp.concatenate([uv, ones], axis=-1)
    return depth[..., None] * (homog @ K_inv.T)


def transform_points(T: jnp.ndarray, xyz: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 rigid transform to (..., 3) points
    (pcl_ros::transformPointCloud / tf2::doTransform equivalents)."""
    return xyz @ T[:3, :3].T + T[:3, 3]


def make_transform(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    T = jnp.eye(4, dtype=jnp.float32)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(t)
    return T


def quat_from_pitch(angle) -> jnp.ndarray:
    """tf2::Quaternion::setRPY(0, -angle, 0) as (..., 4) xyzw.

    Both pose estimators build their yaw quaternion this way — a rotation
    about camera -Y only (cloud_detections.cpp:236, which notoriously
    passes degrees — quirk Q4 is honored by the *caller* passing whatever
    the reference passed; this function is the exact setRPY math).
    """
    a = jnp.asarray(angle)
    half = -a / 2.0
    zeros = jnp.zeros_like(a)
    return jnp.stack([zeros, jnp.sin(half), zeros, jnp.cos(half)], axis=-1)


def quat_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product, xyzw layout (tf2 convention), batched."""
    x1, y1, z1, w1 = (q1[..., i] for i in range(4))
    x2, y2, z2, w2 = (q2[..., i] for i in range(4))
    return jnp.stack([
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
    ], axis=-1)


def quat_from_matrix(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> xyzw quaternion (branch-free Shepperd method).

    Caveat: the branch-free sign recovery degrades for rotations within
    ~1e-3 of exactly 180 deg (w ~ 0), where the off-diagonal differences
    that carry the signs vanish. Fine for its use here (static sensor
    extrinsics); use a branching method if you need that edge exactly.
    """
    m00, m01, m02 = R[0, 0], R[0, 1], R[0, 2]
    m10, m11, m12 = R[1, 0], R[1, 1], R[1, 2]
    m20, m21, m22 = R[2, 0], R[2, 1], R[2, 2]
    tr = m00 + m11 + m22
    # Four candidate constructions; pick the numerically best by max pivot.
    qw = jnp.sqrt(jnp.maximum(1.0 + tr, 0.0)) / 2.0
    qx = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 0.0)) / 2.0
    qy = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 0.0)) / 2.0
    qz = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 0.0)) / 2.0
    qx = jnp.copysign(qx, m21 - m12)
    qy = jnp.copysign(qy, m02 - m20)
    qz = jnp.copysign(qz, m10 - m01)
    q = jnp.stack([qx, qy, qz, qw], axis=-1)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def transform_pose(T: jnp.ndarray, position: jnp.ndarray,
                   quat: jnp.ndarray):
    """tf2::doTransform on a Pose: rotate+translate position, compose
    orientation (grid_vision_node.cpp:361-382)."""
    new_pos = transform_points(T, position)
    q_T = quat_from_matrix(T[:3, :3])
    new_quat = quat_multiply(jnp.broadcast_to(q_T, quat.shape), quat)
    return new_pos, new_quat


def rotation_y(theta) -> jnp.ndarray:
    """R_y used by the MultiBin location solver
    (vision_orientation.cpp:512-519): [[c,0,s],[0,1,0],[-s,0,c]]."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([c, z, s], axis=-1),
        jnp.stack([z, o, z], axis=-1),
        jnp.stack([-s, z, c], axis=-1),
    ], axis=-2)


# ---------------------------------------------------------------------------
# grid_map index math
# ---------------------------------------------------------------------------
# grid_map buffer convention: index (0,0) is the cell at the (+x, +y) max
# corner; index increases toward -x / -y. Cell i's center sits at
# max_corner - (i + 0.5) * resolution. getIndex(position) therefore is
# floor((max_corner - position) / resolution), valid iff the index lands in
# [0, size) on both axes. updateGridCellsFast relies on this via
# grid_map.getIndex (occupancy_grid.cpp:150-152) and skips the whole box if
# any corner is off-map (:171-172).


def grid_index_from_position(pos_xy: jnp.ndarray, center_xy, length_xy,
                             resolution: float):
    """pos_xy: (..., 2) base-frame positions -> ((..., 2) int32 index, valid).

    center_xy / length_xy: 2-tuples of python floats (static geometry).
    """
    center = jnp.asarray(center_xy, jnp.float32)
    length = jnp.asarray(length_xy, jnp.float32)
    size = jnp.round(length / resolution).astype(jnp.int32)
    max_corner = center + 0.5 * length
    idx_f = jnp.floor((max_corner - pos_xy) / resolution)
    idx = idx_f.astype(jnp.int32)
    valid = jnp.all((idx >= 0) & (idx < size), axis=-1)
    return idx, valid


def grid_position_from_index(idx: jnp.ndarray, center_xy, length_xy,
                             resolution: float) -> jnp.ndarray:
    """Cell-center position for (..., 2) int indices."""
    center = jnp.asarray(center_xy, jnp.float32)
    length = jnp.asarray(length_xy, jnp.float32)
    max_corner = center + 0.5 * length
    return max_corner - (idx.astype(jnp.float32) + 0.5) * resolution
