"""Golden tests: occupancy-grid updates vs the NumPy oracle
(occupancy_grid.cpp semantics incl. quirks Q2/Q8/Q11)."""

import jax.numpy as jnp
import numpy as np
import pytest

from grid_vision_tpu.config import GridVisionConfig
from grid_vision_tpu.ops import rasterize
from grid_vision_tpu.types import Boxes, GridState, LShapePoses
from grid_vision_tpu import geometry

from .oracle.reference_oracle import GridOracle

CFG = GridVisionConfig()


def make_poses(entries, capacity=16):
    p = LShapePoses.empty(capacity)
    n = len(entries)
    if n == 0:
        return p
    pos = np.zeros((capacity, 3), np.float32)
    length = np.zeros((capacity,), np.float32)
    width = np.zeros((capacity,), np.float32)
    valid = np.zeros((capacity,), bool)
    for i, e in enumerate(entries):
        pos[i] = (e["px"], e["py"], e.get("pz", 0.0))
        length[i] = e["length"]
        width[i] = e["width"]
        valid[i] = True
    return LShapePoses(
        position=jnp.asarray(pos), quat=p.quat,
        length=jnp.asarray(length), width=jnp.asarray(width),
        height=p.height, label=p.label, valid=jnp.asarray(valid))


def test_geometry_constants():
    assert CFG.grid_size == (500, 200)
    assert CFG.grid_center == (16.0, 0.0)  # quirk Q8: 50 // 3 = 16


def test_index_roundtrip_matches_oracle(rng):
    oracle = GridOracle()
    pts = rng.uniform(-15, 45, size=(512, 2)).astype(np.float32)
    idx, valid = geometry.grid_index_from_position(
        jnp.asarray(pts), CFG.grid_center, (50.0, 20.0), 0.1)
    idx = np.asarray(idx)
    valid = np.asarray(valid)
    for k in range(pts.shape[0]):
        ref = oracle.get_index(float(pts[k, 0]), float(pts[k, 1]))
        if ref is None:
            assert not valid[k], pts[k]
        else:
            assert valid[k], pts[k]
            assert tuple(idx[k]) == ref, pts[k]


def test_decay_only_update():
    oracle = GridOracle()
    state = GridState.create(CFG)
    lo, occ = state.log_odds, state.occupancy
    for _ in range(25):  # enough steps to hit the -2.0 clamp
        oracle.update_decay_only()
        lo, occ = rasterize.decay_update(lo, CFG)
    np.testing.assert_allclose(np.asarray(lo), oracle.log_odds, atol=1e-6)
    np.testing.assert_allclose(np.asarray(occ), oracle.occupancy, atol=1e-6)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_lshape_update_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    oracle = GridOracle()
    state = GridState.create(CFG)
    lo = state.log_odds
    for _step in range(5):
        n = int(rng.integers(0, 6))
        entries = []
        for _ in range(n):
            entries.append({
                # include on-map, off-map, and boundary-straddling boxes
                "px": float(rng.uniform(-15, 50)),
                "py": float(rng.uniform(-15, 15)),
                "length": float(rng.uniform(0.3, 6.0)),
                "width": float(rng.uniform(0.3, 3.0)),
            })
        oracle.update_lshape(entries)
        lo, occ = rasterize.lshape_update(lo, make_poses(entries), CFG)
    np.testing.assert_allclose(np.asarray(lo), oracle.log_odds, atol=1e-5)
    np.testing.assert_allclose(np.asarray(occ), oracle.occupancy, atol=1e-6)


def test_overlapping_boxes_accumulate_before_clamp():
    """Two identical boxes must add 2 * 0.85 before the single clamp."""
    oracle = GridOracle()
    entries = [{"px": 16.0, "py": 0.0, "length": 2.0, "width": 1.0}] * 2
    oracle.update_lshape(entries)
    state = GridState.create(CFG)
    lo, _ = rasterize.lshape_update(state.log_odds, make_poses(entries), CFG)
    np.testing.assert_allclose(np.asarray(lo), oracle.log_odds, atol=1e-6)
    assert oracle.log_odds.max() == np.float32(np.float32(-0.2) + np.float32(0.85) * 2)


def test_box_with_offmap_corner_is_skipped_entirely():
    """quirk: ANY off-map corner skips the whole box, even if most of it
    is on-map (occupancy_grid.cpp:171-172)."""
    oracle = GridOracle()
    entries = [{"px": 40.0, "py": 0.0, "length": 5.0, "width": 1.0}]
    # max corner x = 42.5 > 41.0 (map spans x in (-9, 41]) -> skipped
    oracle.update_lshape(entries)
    state = GridState.create(CFG)
    lo, _ = rasterize.lshape_update(state.log_odds, make_poses(entries), CFG)
    np.testing.assert_allclose(np.asarray(lo), oracle.log_odds, atol=1e-6)
    assert oracle.log_odds.max() < 0  # only decay happened


def test_point_bbox_update_matches_oracle(rng):
    oracle = GridOracle()
    n, cap = 5, 16
    pts = np.zeros((cap, 3), np.float32)
    labels = np.full((cap,), 10, np.int32)
    valid = np.zeros((cap,), bool)
    pts[:n, 0] = rng.uniform(0, 35, n)
    pts[:n, 1] = rng.uniform(-8, 8, n)
    labels[:n] = [9, 2, 0, 1, 5]  # incl. a static class (depth -1)
    valid[:n] = True
    oracle.update_point_bbox(pts[:n], labels[:n])
    boxes = Boxes(xyxy=jnp.zeros((cap, 4)), confidence=jnp.zeros((cap,)),
                  label=jnp.asarray(labels), valid=jnp.asarray(valid))
    state = GridState.create(CFG)
    lo, _ = rasterize.point_bbox_update(
        state.log_odds, jnp.asarray(pts), boxes, CFG)
    np.testing.assert_allclose(np.asarray(lo), oracle.log_odds, atol=1e-5)


def test_export_i8():
    oracle = GridOracle()
    oracle.update_lshape([{"px": 16.0, "py": 0.0, "length": 3.0,
                           "width": 2.0}])
    state = GridState.create(CFG)
    lo, occ = rasterize.lshape_update(
        state.log_odds,
        make_poses([{"px": 16.0, "py": 0.0, "length": 3.0, "width": 2.0}]),
        CFG)
    got = np.asarray(rasterize.export_occupancy_i8(occ))
    np.testing.assert_array_equal(got, oracle.export_i8())
