"""Raycast free-space carving extension tests.

Two carve implementations with different beam models:
  - carve_mask_sampled: exact per-ray LINE carving (dense samples);
  - carve_mask: polar BEAM carving (angle-binned ranges) — the fast
    production path, correct for angularly dense scans (real lidar).
"""

import jax.numpy as jnp
import numpy as np

from grid_vision_tpu.config import GridVisionConfig
from grid_vision_tpu.geometry import grid_index_from_position
from grid_vision_tpu.ops import raycast
from grid_vision_tpu.types import GridState, LShapePoses

CFG = GridVisionConfig(compat=False, raycast_free_space=True)
LENGTH = (float(CFG.grid_x), float(CFG.grid_y))


def cell_of(x, y):
    idx, ok = grid_index_from_position(
        jnp.asarray([x, y]), CFG.grid_center, LENGTH, CFG.resolution)
    assert bool(ok)
    return int(idx[0]), int(idx[1])


def fan_endpoints(r=20.0, n=720):
    """Angularly dense fan of endpoints at constant range (a lidar arc
    covering the forward half plane)."""
    ang = np.linspace(-np.pi / 2, np.pi / 2, n)
    return jnp.asarray(
        np.stack([r * np.cos(ang), r * np.sin(ang)], -1), jnp.float32)


def test_sampled_line_carve_exact():
    origin = jnp.asarray([0.0, 0.0])
    pts = jnp.asarray([[20.0, 0.0]])
    mask = np.asarray(raycast.carve_mask_sampled(
        origin, pts, jnp.asarray([True]), CFG, n_samples=256))
    assert mask[cell_of(10.0, 0.0)] == 1.0      # on the ray
    assert mask[cell_of(20.0, 0.0)] == 0.0      # endpoint cell protected
    assert mask[cell_of(10.0, 5.0)] == 0.0      # off the ray
    assert 150 <= mask.sum() <= 300


def test_polar_beam_carve():
    origin = jnp.asarray([0.0, 0.0])
    pts = fan_endpoints(r=20.0)
    valid = jnp.ones(pts.shape[0], bool)
    mask = np.asarray(raycast.carve_mask(origin, pts, valid, CFG))
    # inside the fan, well before the endpoints: carved
    assert mask[cell_of(10.0, 0.0)] == 1.0
    assert mask[cell_of(10.0, 5.0)] == 1.0      # inside the wedge too
    assert mask[cell_of(5.0, -5.0)] == 1.0
    # at/beyond the measured range: not carved
    assert mask[cell_of(20.0, 0.0)] == 0.0
    assert mask[cell_of(25.0, 0.0)] == 0.0
    # behind the sensor (no beams): not carved
    assert mask[cell_of(-5.0, 0.0)] == 0.0
    # mask is binary regardless of overlapping beams
    assert set(np.unique(mask)) <= {0.0, 1.0}


def test_polar_carve_respects_per_bin_range():
    """A short return in one direction must not carve past itself even
    when neighboring beams reach farther."""
    origin = jnp.asarray([0.0, 0.0])
    pts = np.array(fan_endpoints(r=20.0))
    # make the straight-ahead beams stop at 8 m over a wedge wider than
    # the carve's bin-dilation window, so the shadow survives smoothing
    mid = len(pts) // 2
    for off in range(-2, 3):
        ang = off * 0.02  # radians; wedge ~ +-1.1 deg
        pts[mid + off] = [8.0 * np.cos(ang), 8.0 * np.sin(ang)]
    mask = np.asarray(raycast.carve_mask(
        origin, jnp.asarray(pts), jnp.ones(len(pts), bool), CFG))
    assert mask[cell_of(5.0, 0.0)] == 1.0       # before the short return
    assert mask[cell_of(12.0, 0.0)] == 0.0      # shadow behind it


def test_carving_update_lowers_free_cells():
    state = GridState.create(CFG)
    origin = jnp.asarray([0.0, 0.0])
    pts = fan_endpoints(r=20.0)
    lo, occ = raycast.lshape_update_with_carving(
        state.log_odds, LShapePoses.empty(4), origin, pts,
        jnp.ones(pts.shape[0], bool), CFG)
    lo = np.asarray(lo)
    # carved cell: decay + free = -0.2 - 0.4
    np.testing.assert_allclose(lo[cell_of(10.0, 0.0)], -0.6, atol=1e-6)
    # uncarved cell (beyond range): decay only
    np.testing.assert_allclose(lo[cell_of(25.0, 0.0)], -0.2, atol=1e-6)


def test_pipeline_with_raycast_smoke():
    import functools
    import jax
    from grid_vision_tpu import pipeline
    from grid_vision_tpu.demo import default_extrinsics, oracle_boxes
    from grid_vision_tpu.io.scene import SyntheticScene
    from grid_vision_tpu.runtime.stream import obs_from_scene

    cfg = GridVisionConfig(compat=False, raycast_free_space=True,
                           use_vision_orientation=False, max_points=4096,
                           compute_dtype="float32")
    eng = pipeline.Engine(cfg, extrinsics=default_extrinsics(), seed=0)
    scene = SyntheticScene(cfg, seed=0, n_ground=2000)
    scene.add_default_traffic()
    fuse = jax.jit(functools.partial(pipeline.fuse, cfg=cfg))
    state = eng.init_state()
    for i in range(3):
        obs = obs_from_scene(scene, i / 10.0, cfg)
        boxes = oracle_boxes(scene, i / 10.0, cfg)
        state, out = fuse(eng.params, state, obs, boxes, eng.extrinsics)
    lo = np.asarray(state.log_odds)
    # carved free space should push below pure decay somewhere
    assert lo.min() <= 3 * (-0.2 - 0.4) + 1e-5
    assert lo.max() > 0  # and hits still rasterize
