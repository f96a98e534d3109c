"""Geometry unit tests: projection round-trips, quaternions, transforms."""

import jax.numpy as jnp
import numpy as np

from grid_vision_tpu import geometry

from .oracle.reference_oracle import pixel_to_3d, quat_set_rpy


def test_intrinsics_and_inverse():
    K = geometry.intrinsic_matrix(320.0, 320.0, 320.0, 240.0)
    K_inv = geometry.intrinsic_inverse(K)
    np.testing.assert_allclose(np.asarray(K @ K_inv), np.eye(3), atol=1e-6)


def test_project_backproject_roundtrip(rng):
    K = geometry.intrinsic_matrix(320.0, 320.0, 320.0, 240.0)
    K_inv = geometry.intrinsic_inverse(K)
    pts = rng.uniform([-5, -2, 1], [5, 2, 40], size=(128, 3)).astype(np.float32)
    u, v, z = geometry.project_points(jnp.asarray(pts), K)
    rec = geometry.pixel_to_3d(jnp.stack([u, v], -1), z, K_inv)
    np.testing.assert_allclose(np.asarray(rec), pts, rtol=1e-4, atol=1e-4)


def test_pixel_to_3d_matches_oracle(rng):
    K = geometry.intrinsic_matrix(320.0, 320.0, 320.0, 240.0)
    K_inv = geometry.intrinsic_inverse(K)
    for _ in range(16):
        u, v = rng.uniform(0, 640), rng.uniform(0, 480)
        d = rng.uniform(0.5, 50)
        ref = pixel_to_3d(u, v, d, np.asarray(K_inv))
        got = geometry.pixel_to_3d(jnp.asarray([u, v], jnp.float32),
                                   jnp.asarray(d, jnp.float32), K_inv)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


def test_quat_from_pitch_matches_setrpy(rng):
    # Large-magnitude angles happen in practice: quirk Q4 feeds degrees
    # (up to +-180) into the radian API. f32 trig of large args loses a
    # few ulps vs the f64 oracle, hence the tolerance.
    for a in rng.uniform(-360, 360, size=12):
        ref = quat_set_rpy(0.0, -a, 0.0)
        got = geometry.quat_from_pitch(jnp.asarray(a, jnp.float32))
        np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4)


def test_transform_pose_rotation_compose(rng):
    # 90 deg yaw about z + translation
    c, s = 0.0, 1.0
    R = jnp.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]], jnp.float32)
    T = geometry.make_transform(R, jnp.asarray([1.0, 2.0, 3.0]))
    pos = jnp.asarray([[1.0, 0.0, 0.0]])
    quat = jnp.asarray([[0.0, 0.0, 0.0, 1.0]])
    new_pos, new_quat = geometry.transform_pose(T, pos, quat)
    np.testing.assert_allclose(np.asarray(new_pos[0]), [1.0, 3.0, 3.0],
                               atol=1e-6)
    # resulting quat = 90deg-about-z
    np.testing.assert_allclose(
        np.abs(np.asarray(new_quat[0])),
        [0.0, 0.0, np.sin(np.pi / 4), np.cos(np.pi / 4)], atol=1e-6)


def test_rotation_y_matches_reference_layout():
    th = 0.7
    R = np.asarray(geometry.rotation_y(jnp.asarray(th)))
    c, s = np.cos(th), np.sin(th)
    np.testing.assert_allclose(R, [[c, 0, s], [0, 1, 0], [-s, 0, c]],
                               atol=1e-6)


def test_quat_from_matrix_roundtrip(rng):
    for _ in range(8):
        a = rng.uniform(-np.pi, np.pi)
        R = np.array([[np.cos(a), -np.sin(a), 0],
                      [np.sin(a), np.cos(a), 0],
                      [0, 0, 1]], np.float32)
        q = np.asarray(geometry.quat_from_matrix(jnp.asarray(R)))
        # rotate x-axis by q and by R, compare
        x, y, z, w = q
        qv = np.array([x, y, z])
        v = np.array([1.0, 0, 0])
        rotated = v + 2 * np.cross(qv, np.cross(qv, v) + w * v)
        np.testing.assert_allclose(rotated, R @ v, atol=1e-5)
