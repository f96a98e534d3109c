"""MultiBin (Deep3DBox) post-processing: bins, alpha, theta_ray, and the
64-combination constrained least-squares location solver.

TPU re-design of src/vision_orientation.cpp:241-519:

  - generateBins(2) (:241-258) -> static [pi/2, 3pi/2];
  - computeAlpha (:260-275), computeThetaRay (:277-292) -> vectorized;
  - calcLocation (:294-447): the reference QR-solves 64 independent 4x3
    systems per box. Because the projection matrix has zero translation
    (proj_mat = [K | 0], :19-20), A = K[idx,:3] - box_val * K[2,:3] is
    IDENTICAL across all 64 constraint combinations — only b varies. So
    the whole search collapses to ONE 3x3 normal-equation solve per box
    plus a (3,4)@(4,64) matmul: orders of magnitude cheaper than 64 QR
    factorizations, bit-for-bit the same argmin (strict <, first wins ==
    argmin's first-occurrence tie-break);
  - dims come from per-class KITTI-style averages + network residuals
    with the reference's index remap: length <- dims[2], width <- dims[0],
    height <- dims[1] (:472-495);
  - non-dynamic labels are skipped (:496-499) -> masked invalid;
  - yaw quaternion setRPY(0, -orient, 0) (:439-444).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..config import GridVisionConfig
from ..geometry import quat_from_pitch, rotation_y
from ..taxonomy import avg_dims, is_dynamic
from ..types import Boxes, LShapePoses

# generateBins(2): interval = pi; centers [pi/2, 3pi/2].
ANGLE_BINS_2 = np.array([np.pi / 2.0, 3.0 * np.pi / 2.0], np.float32)


def compute_alpha(orientation: jnp.ndarray, confidence: jnp.ndarray):
    """orientation: (N, B, 2) [cos, sin] per bin; confidence: (N, B).
    alpha = atan2(sin, cos) + bin_center[argmax conf] - pi."""
    bins = jnp.asarray(ANGLE_BINS_2)
    argmax = jnp.argmax(confidence, axis=-1)                 # (N,)
    sel = jnp.take_along_axis(
        orientation, argmax[:, None, None], axis=1)[:, 0]    # (N, 2)
    return jnp.arctan2(sel[:, 1], sel[:, 0]) + bins[argmax] - jnp.pi


def compute_theta_ray(boxes: Boxes, fx: float, orig_w: int) -> jnp.ndarray:
    """Ray angle to the box center from image geometry (:277-292)."""
    fovx = 2.0 * np.arctan(orig_w / (2.0 * fx))              # static
    center_x = (boxes.xyxy[:, 0] + boxes.xyxy[:, 2]) / 2.0
    dx = center_x - orig_w / 2.0
    sign = jnp.where(dx < 0, -1.0, 1.0)
    angle = jnp.arctan((2.0 * jnp.abs(dx) * np.tan(fovx / 2.0)) / orig_w)
    return sign * angle


def _constraint_combos(dx, dy, dz, left_mult, right_mult, switch_mult):
    """Build the (64, 4, 3) constraint tensor in the reference's loop
    nesting order: left(2) x top(4) x right(2) x bottom(4) (:359-374)."""
    pm = jnp.asarray([-1.0, 1.0])
    # left[i] = (left_mult*dx, i*dy, -switch*dz); right[i] analogous.
    left = jnp.stack([jnp.broadcast_to(left_mult * dx, (2,)),
                      pm * dy,
                      jnp.broadcast_to(-switch_mult * dz, (2,))], axis=-1)
    right = jnp.stack([jnp.broadcast_to(right_mult * dx, (2,)),
                       pm * dy,
                       jnp.broadcast_to(switch_mult * dz, (2,))], axis=-1)
    # top[i,j] = (i*dx, -dy, j*dz); bottom[i,j] = (i*dx, dy, j*dz),
    # flattened i-major (:348-357).
    ii = jnp.repeat(pm, 2)
    jj = jnp.tile(pm, 2)
    top = jnp.stack([ii * dx, jnp.broadcast_to(-dy, (4,)), jj * dz], -1)
    bottom = jnp.stack([ii * dx, jnp.broadcast_to(dy, (4,)), jj * dz], -1)

    # combo index c = ((l*4 + t)*2 + r)*4 + b
    l_idx = jnp.arange(64) // 32
    t_idx = (jnp.arange(64) // 8) % 4
    r_idx = (jnp.arange(64) // 4) % 2
    b_idx = jnp.arange(64) % 4
    return jnp.stack([left[l_idx], top[t_idx], right[r_idx],
                      bottom[b_idx]], axis=1)                 # (64, 4, 3)


def _calc_location_single(length, width, height, xyxy, alpha, theta_ray, K):
    """One box: best 3D location over 64 constraint combos (:294-447)."""
    orient = alpha + theta_ray
    R = rotation_y(orient)                                    # (3, 3)
    dx = length / 2.0
    dy = width / 2.0   # reference comment says height/2 but indexes [1]
    dz = height / 2.0  # reference comment says width/2 but indexes [2]

    deg88 = 88.0 * jnp.pi / 180.0
    deg90 = 90.0 * jnp.pi / 180.0
    deg92 = 92.0 * jnp.pi / 180.0
    # The elif chain (:316-330), innermost default (1, -1).
    in_plus90 = (alpha < deg92) & (alpha > deg88)
    in_minus90 = (alpha < -deg88) & (alpha > -deg92)
    in_front = (alpha < deg90) & (alpha > -deg90)
    left_mult = jnp.where(in_plus90, 1.0,
                          jnp.where(in_minus90, -1.0,
                                    jnp.where(in_front, -1.0, 1.0)))
    right_mult = jnp.where(in_plus90, 1.0,
                           jnp.where(in_minus90, -1.0,
                                     jnp.where(in_front, 1.0, -1.0)))
    switch_mult = jnp.where(alpha > 0, 1.0, -1.0)

    X = _constraint_combos(dx, dy, dz, left_mult, right_mult, switch_mult)
    RX = X @ R.T                                              # (64, 4, 3)
    KRX = RX @ K.T                                            # (64, 4, 3): K @ RX per corner

    box_vals = jnp.stack([xyxy[0], xyxy[1], xyxy[2], xyxy[3]])  # (4,)
    row_idx = jnp.asarray([0, 1, 0, 1])
    # A is combo-independent: A[row] = K[idx] - box_val * K[2]  (3-vec).
    A = K[row_idx] - box_vals[:, None] * K[2][None, :]        # (4, 3)
    # b[combo, row] = box_val * KRX[combo, row, 2] - KRX[combo, row, idx]
    krx_idx = jnp.take_along_axis(KRX, row_idx[None, :, None],
                                  axis=-1)[..., 0]            # (64, 4)
    b = box_vals[None, :] * KRX[..., 2] - krx_idx             # (64, 4)

    # Least squares loc = (A^T A)^-1 A^T b for all 64 b's at once.
    # Closed-form SPD 3x3 inverse instead of jnp.linalg.solve: batched
    # tiny LU lowers to a serial loop on TPU and dominated the whole
    # orientation branch (tools/perf_ablate.py). Globally rescale the
    # system first so the f32 determinant cannot overflow (A entries are
    # O(focal * pixel) ~ 1e5; scaling leaves the LS solution unchanged).
    scale = 1.0 / 1024.0
    A_s = A * scale                                           # (4, 3)
    b_s = b * scale                                           # (64, 4)
    AtA = A_s.T @ A_s                                         # (3, 3)
    Atb = b_s @ A_s                                           # (64, 3)
    locs = Atb @ _inv3x3_spd(AtA).T                           # (64, 3)
    resid = A_s @ locs.T - b_s.T                              # (4, 64)
    errors = jnp.sum(resid * resid, axis=0)                   # (64,)
    best = jnp.argmin(errors)                                 # first min
    return locs[best], orient


def _inv3x3_spd(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form 3x3 inverse (adjugate / determinant) — fully
    vectorized elementwise ops, no lax.linalg."""
    a, b, c = M[0, 0], M[0, 1], M[0, 2]
    d, e, f = M[1, 0], M[1, 1], M[1, 2]
    g, h, i = M[2, 0], M[2, 1], M[2, 2]
    A_ = e * i - f * h
    B_ = -(d * i - f * g)
    C_ = d * h - e * g
    det = a * A_ + b * B_ + c * C_
    adj = jnp.stack([
        jnp.stack([A_, -(b * i - c * h), b * f - c * e]),
        jnp.stack([B_, a * i - c * g, -(a * f - c * d)]),
        jnp.stack([C_, -(a * h - b * g), a * e - b * d]),
    ])
    return adj / det


def multibin_poses(orientation: jnp.ndarray, confidence: jnp.ndarray,
                   dims: jnp.ndarray, boxes: Boxes, K: jnp.ndarray,
                   cfg: GridVisionConfig) -> LShapePoses:
    """postProcessOutputs (:449-510) over a padded batch of boxes.

    orientation: (N, 2, 2); confidence: (N, 2); dims: (N, 3) residuals;
    boxes: padded Boxes of the same capacity N. Returns camera-frame
    LShapePoses; valid = box valid AND dynamic class.
    """
    alpha = compute_alpha(orientation, confidence)
    theta_ray = compute_theta_ray(boxes, cfg.fx, cfg.camera_image_width)
    avg = avg_dims(boxes.label)                               # (N, 3) l,w,h
    length = dims[:, 2] + avg[:, 0]
    width = dims[:, 0] + avg[:, 1]
    height = dims[:, 1] + avg[:, 2]

    locs, orient = jax.vmap(
        _calc_location_single, in_axes=(0, 0, 0, 0, 0, 0, None))(
        length, width, height, boxes.xyxy, alpha, theta_ray, K)

    valid = boxes.valid & is_dynamic(boxes.label)
    return LShapePoses(
        position=locs,
        quat=quat_from_pitch(orient),
        length=length,
        width=width,
        height=height,
        label=boxes.label,
        valid=valid,
    )
