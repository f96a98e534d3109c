"""Golden tests: radius outlier removal + PCA L-shape pose vs the oracle
(cloud_detections.cpp:140-247 incl. quirk Q4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from grid_vision_tpu.ops import lshape

from .oracle.reference_oracle import pca_lshape, radius_outlier_removal


def dense_cluster(rng, center, n=80, spread=0.15):
    return (center + rng.normal(0, spread, size=(n, 3))).astype(np.float32)


def pad(pts, capacity=256):
    out = np.zeros((capacity, 3), np.float32)
    valid = np.zeros((capacity,), bool)
    n = min(len(pts), capacity)
    out[:n] = pts[:n]
    valid[:n] = True
    return out, valid


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_outlier_removal_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    cluster = dense_cluster(rng, np.array([1.0, 1.5, 10.0]))
    outliers = rng.uniform(-5, 5, size=(6, 3)).astype(np.float32) + \
        np.array([0, 0, 10.0], np.float32)
    pts = np.concatenate([cluster, outliers])
    rng.shuffle(pts)
    ref = radius_outlier_removal(pts, 0.4, 10)

    padded, valid = pad(pts)
    keep = np.asarray(lshape.radius_outlier_mask(
        jnp.asarray(padded), jnp.asarray(valid), 0.4, 10))
    got = padded[keep]
    got_sorted = got[np.lexsort(got.T)]
    ref_sorted = ref[np.lexsort(ref.T)]
    np.testing.assert_allclose(got_sorted, ref_sorted, rtol=1e-6)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_pca_pose_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    # Elongated car-like cluster, rotated in the (z, x) ground plane.
    n = 200
    local = np.stack([
        rng.uniform(-2.0, 2.0, n),          # along length
        rng.uniform(-0.3, 0.3, n),          # along width
    ], axis=1)
    ang = rng.uniform(-np.pi / 2, np.pi / 2)
    R = np.array([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]])
    zw = local @ R.T + np.array([12.0, 1.0])      # (z, x) coords
    y = rng.uniform(0.2, 0.8, n)
    pts = np.stack([zw[:, 1], y, zw[:, 0]], axis=1).astype(np.float32)

    filtered = radius_outlier_removal(pts, 0.4, 10)
    ref = pca_lshape(filtered)
    assert ref is not None

    padded, valid = pad(pts)
    poses = lshape.pca_lshape_poses(
        jnp.asarray(padded)[None], jnp.asarray(valid)[None],
        jnp.asarray([9], jnp.int32), 0.4, 10)
    assert bool(np.asarray(poses.valid)[0])
    got_pos = np.asarray(poses.position)[0]
    np.testing.assert_allclose(got_pos[0], ref["px"], atol=1e-3)
    np.testing.assert_allclose(got_pos[1], ref["py"], atol=1e-3)
    np.testing.assert_allclose(got_pos[2], ref["pz"], atol=1e-3)
    np.testing.assert_allclose(np.asarray(poses.length)[0], ref["length"],
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(poses.width)[0], ref["width"],
                               rtol=1e-3)
    # Quirk Q4 quaternion (degrees into radian API)
    np.testing.assert_allclose(np.asarray(poses.quat)[0], ref["quat"],
                               atol=2e-3)


def test_sparse_box_produces_no_pose():
    """Fewer than min_neighbors points in a box -> all filtered -> no pose
    (the reference's ``continue`` on empty data)."""
    rng = np.random.default_rng(5)
    pts = rng.uniform(-3, 3, size=(6, 3)).astype(np.float32)
    padded, valid = pad(pts, 64)
    poses = lshape.pca_lshape_poses(
        jnp.asarray(padded)[None], jnp.asarray(valid)[None],
        jnp.asarray([9], jnp.int32), 0.4, 10)
    assert not bool(np.asarray(poses.valid)[0])
