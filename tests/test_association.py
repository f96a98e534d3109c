"""Golden tests: projection, kNN median depth, frustum association, and
ground-plane RANSAC vs the NumPy oracle (cloud_detections.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grid_vision_tpu import geometry
from grid_vision_tpu.ops import association, plane
from grid_vision_tpu.types import Boxes, PointCloud

from .oracle.reference_oracle import (build_image_points,
                                      extract_cloud_per_bbox,
                                      knn_median_depths)

K_NP = np.array([[320.0, 0, 320.0], [0, 320.0, 240.0], [0, 0, 1]], np.float32)


def make_cloud(rng, n=500, capacity=1024, behind_frac=0.1):
    xyz = rng.uniform([-10, -3, 0.5], [10, 3, 60], size=(n, 3))
    nb = int(n * behind_frac)
    xyz[:nb, 2] = rng.uniform(-5, 0, nb)  # points behind the camera
    rng.shuffle(xyz)
    return xyz.astype(np.float32), PointCloud.from_numpy(xyz, None, capacity)


def make_boxes(entries, capacity=16):
    b = Boxes.empty(capacity)
    xyxy = np.zeros((capacity, 4), np.float32)
    label = np.full((capacity,), 10, np.int32)
    valid = np.zeros((capacity,), bool)
    for i, e in enumerate(entries):
        xyxy[i] = [e["x_min"], e["y_min"], e["x_max"], e["y_max"]]
        label[i] = e.get("label", 9)
        valid[i] = True
    return Boxes(xyxy=jnp.asarray(xyxy), confidence=b.confidence,
                 label=jnp.asarray(label), valid=jnp.asarray(valid))


BOXES = [
    {"x_min": 100, "y_min": 100, "x_max": 250, "y_max": 280},
    {"x_min": 220, "y_min": 90, "x_max": 400, "y_max": 300},  # overlaps 1st
    {"x_min": 500, "y_min": 350, "x_max": 630, "y_max": 470},
    {"x_min": -50, "y_min": -50, "x_max": 30, "y_max": 40},   # partly offscreen
]


@pytest.mark.parametrize("seed", [0, 1])
def test_knn_median_depth_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    xyz, cloud = make_cloud(rng)
    ref_pts = build_image_points(xyz, K_NP)
    ref = knn_median_depths(ref_pts, BOXES, k=4)

    K = jnp.asarray(K_NP)
    uvd, valid = association.project_cloud_to_image(cloud, K)
    got = association.knn_median_depth(uvd, valid, make_boxes(BOXES), k=4)
    got = np.asarray(got)[: len(BOXES)]
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_knn_first_occurrence_tie_oracle():
    """The chunked streaming exact kNN's tie contract: equal d2 at the
    k boundary resolves to the LOWEST global point index (bests precede
    each chunk in the merged candidate row and argmin takes the first
    occurrence). Locked against an implementation-independent NumPy
    stable-sort oracle over heavily tied distances (grid-quantized
    coordinates), so any reformulation (e.g. a lax.top_k merge — a
    measured perf negative, see tools/bench_knn_ab.py) must preserve
    the selected neighbor SET, not just the distances."""
    rng = np.random.default_rng(7)
    # Quantized coordinates -> many exactly-equal squared distances,
    # with distinct depths at tied distances so a wrong tie pick
    # changes the median.
    xyz = rng.integers(-4, 5, size=(600, 3)).astype(np.float32)
    xyz[:, 2] = np.abs(xyz[:, 2]) + 1.0 + 0.001 * np.arange(600)
    cloud = PointCloud.from_numpy(xyz, None, 1024)
    K = jnp.asarray(K_NP)
    uvd, valid = association.project_cloud_to_image(cloud, K)
    boxes = make_boxes(BOXES)
    k = 4

    got = np.asarray(association.knn_median_depth(uvd, valid, boxes, k))

    uvd_np, valid_np = np.asarray(uvd), np.asarray(valid)
    centers = np.asarray(boxes.centers())
    for i in range(len(BOXES)):
        d2 = (np.sum((centers[i, None, :] - uvd_np[:, :2]) ** 2, axis=-1)
              + uvd_np[:, 2] ** 2)
        d2 = np.where(valid_np, d2, np.inf)
        order = np.argsort(d2, kind="stable")[:k]   # first-occurrence ties
        depths = np.sort(uvd_np[order, 2][np.isfinite(d2[order])])
        assert depths.size > 0
        assert got[i] == np.float32(depths[depths.size // 2])


def test_knn_empty_cloud_returns_minus_one():
    cloud = PointCloud.empty(256)
    uvd, valid = association.project_cloud_to_image(cloud, jnp.asarray(K_NP))
    got = association.knn_median_depth(uvd, valid, make_boxes(BOXES), k=4)
    np.testing.assert_array_equal(np.asarray(got)[: len(BOXES)], -1.0)


def test_knn_fewer_points_than_k():
    """n < k: FLANN returns n neighbors; median index = n // 2."""
    xyz = np.array([[0.0, 0.0, 5.0], [0.1, 0.0, 9.0]], np.float32)
    cloud = PointCloud.from_numpy(xyz, None, 64)
    ref_pts = build_image_points(xyz, K_NP)
    ref = knn_median_depths(ref_pts, BOXES[:1], k=4)
    uvd, valid = association.project_cloud_to_image(cloud, jnp.asarray(K_NP))
    got = association.knn_median_depth(uvd, valid, make_boxes(BOXES[:1]), k=4)
    np.testing.assert_allclose(np.asarray(got)[0], ref[0], rtol=1e-5)


@pytest.mark.parametrize("seed", [0, 1])
def test_first_match_assignment_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    xyz, cloud = make_cloud(rng, n=800)
    ref_clouds = extract_cloud_per_bbox(xyz, K_NP, BOXES, 640, 480)

    boxes = make_boxes(BOXES)
    assign, _, _ = association.assign_points_to_boxes(
        cloud.xyz, cloud.mask(), jnp.asarray(K_NP), boxes, 640, 480)
    counts = np.asarray(association.count_assigned(assign, boxes.capacity))
    for i, rc in enumerate(ref_clouds):
        assert counts[i] == rc.shape[0], f"box {i}"
    # And the actual gathered point sets must match (order-insensitive).
    pts, valid, trunc = association.gather_box_clouds(
        cloud.xyz, assign, boxes.capacity, 1024)
    assert not np.asarray(trunc).any()
    for i, rc in enumerate(ref_clouds):
        got = np.asarray(pts[i])[np.asarray(valid[i])]
        got_sorted = got[np.lexsort(got.T)]
        ref_sorted = rc[np.lexsort(rc.T)]
        np.testing.assert_allclose(got_sorted, ref_sorted, rtol=1e-6)


def test_overlap_goes_to_first_box():
    """A point inside both box 0 and box 1 must land in box 0 only
    (the reference's ``break`` after first match)."""
    # pixel (235, 200) is inside both BOXES[0] and BOXES[1]
    d = 10.0
    x = (235 - 320) / 320 * d
    y = (200 - 240) / 320 * d
    xyz = np.array([[x, y, d]], np.float32)
    cloud = PointCloud.from_numpy(xyz, None, 16)
    boxes = make_boxes(BOXES)
    assign, u, v = association.assign_points_to_boxes(
        cloud.xyz, cloud.mask(), jnp.asarray(K_NP), boxes, 640, 480)
    assert int(np.asarray(assign)[0]) == 0


def test_ransac_ground_plane():
    rng = np.random.default_rng(3)
    n_ground, n_obj = 600, 120
    gx = rng.uniform(-10, 10, n_ground)
    gz = rng.uniform(1, 50, n_ground)
    gy = np.full(n_ground, 1.8) + rng.normal(0, 0.01, n_ground)  # cam y-down
    ground = np.stack([gx, gy, gz], 1)
    ox = rng.uniform(-2, 2, n_obj)
    oz = rng.uniform(8, 12, n_obj)
    oy = rng.uniform(-0.5, 1.4, n_obj)
    obj = np.stack([ox, oy, oz], 1)
    xyz = np.concatenate([ground, obj]).astype(np.float32)
    rng.shuffle(xyz)
    cloud = PointCloud.from_numpy(xyz, None, 1024)

    non_ground, plane_coeffs, ok = plane.segment_ground_plane(
        cloud.xyz, cloud.mask(), jax.random.PRNGKey(0), iters=128,
        distance_threshold=0.04)
    assert bool(ok)
    n_kept = int(np.asarray(non_ground).sum())
    # all object points kept, nearly all ground removed
    assert n_obj * 0.95 <= n_kept <= n_obj + n_ground * 0.05
    # plane normal ~ (0, 1, 0), offset ~ -1.8
    pc = np.asarray(plane_coeffs)
    pc = pc * np.sign(pc[1])
    assert abs(pc[1]) > 0.99
    np.testing.assert_allclose(pc[3], -1.8, atol=0.05)


def test_ransac_too_few_points():
    cloud = PointCloud.from_numpy(np.zeros((2, 3), np.float32), None, 64)
    non_ground, _, ok = plane.segment_ground_plane(
        cloud.xyz, cloud.mask(), jax.random.PRNGKey(0), iters=32,
        distance_threshold=0.04)
    assert not bool(ok)
    assert not np.asarray(non_ground).any()


def test_pallas_knn_matches_xla(rng):
    from grid_vision_tpu.ops.pallas_knn import knn_median_depth_pallas
    xyz, cloud = make_cloud(rng, n=700)
    uvd, valid = association.project_cloud_to_image(cloud, jnp.asarray(K_NP))
    boxes = make_boxes(BOXES)
    ref = np.asarray(association.knn_median_depth(uvd, valid, boxes, 4))
    got = np.asarray(knn_median_depth_pallas(uvd, valid, boxes, 4))
    np.testing.assert_allclose(got[:len(BOXES)], ref[:len(BOXES)],
                               rtol=1e-6)
