"""Raycast free-space carving extension tests."""

import jax.numpy as jnp
import numpy as np

from grid_vision_tpu.config import GridVisionConfig
from grid_vision_tpu.geometry import grid_index_from_position
from grid_vision_tpu.ops import raycast
from grid_vision_tpu.types import GridState, LShapePoses

CFG = GridVisionConfig(compat=False, raycast_free_space=True)


def test_carve_marks_cells_along_ray_not_endpoint():
    origin = jnp.asarray([0.0, 0.0])
    # single ray straight ahead to (20, 0)
    pts = jnp.asarray([[20.0, 0.0]])
    mask = raycast.carve_mask(origin, pts, jnp.asarray([True]), CFG,
                              n_samples=256)
    m = np.asarray(mask)
    length = (float(CFG.grid_x), float(CFG.grid_y))
    # cells along the segment x in (0, 20), y = 0 are carved
    mid_idx, ok = grid_index_from_position(
        jnp.asarray([10.0, 0.0]), CFG.grid_center, length, CFG.resolution)
    assert bool(ok)
    assert m[int(mid_idx[0]), int(mid_idx[1])] == 1.0
    # the endpoint cell is NOT carved
    end_idx, ok = grid_index_from_position(
        jnp.asarray([20.0, 0.0]), CFG.grid_center, length, CFG.resolution)
    assert m[int(end_idx[0]), int(end_idx[1])] == 0.0
    # off-ray cells untouched
    far_idx, _ = grid_index_from_position(
        jnp.asarray([10.0, 5.0]), CFG.grid_center, length, CFG.resolution)
    assert m[int(far_idx[0]), int(far_idx[1])] == 0.0
    # carve count roughly the ray's on-map cell count (~ (20-(-9))/0.1
    # capped by map: x in (-9, 20) -> <= 290 cells, at least the visible
    # forward section)
    assert 150 <= m.sum() <= 300


def test_carve_once_per_scan():
    """Many rays through the same cells: mask stays binary (scatter-max)."""
    origin = jnp.asarray([0.0, 0.0])
    pts = jnp.asarray([[20.0, 0.0]] * 50)
    mask = raycast.carve_mask(origin, pts, jnp.ones(50, bool), CFG,
                              n_samples=128)
    assert float(np.asarray(mask).max()) == 1.0


def test_carving_update_lowers_free_cells():
    state = GridState.create(CFG)
    origin = jnp.asarray([0.0, 0.0])
    pts = jnp.asarray([[20.0, 0.0]])
    lo, occ = raycast.lshape_update_with_carving(
        state.log_odds, LShapePoses.empty(4), origin, pts,
        jnp.asarray([True]), CFG)
    lo = np.asarray(lo)
    length = (float(CFG.grid_x), float(CFG.grid_y))
    mid_idx, _ = grid_index_from_position(
        jnp.asarray([10.0, 0.0]), CFG.grid_center, length, CFG.resolution)
    # carved cell: decay + free = -0.2 - 0.4
    np.testing.assert_allclose(lo[int(mid_idx[0]), int(mid_idx[1])], -0.6,
                               atol=1e-6)
    # uncarved cell: decay only
    far_idx, _ = grid_index_from_position(
        jnp.asarray([10.0, 5.0]), CFG.grid_center, length, CFG.resolution)
    np.testing.assert_allclose(lo[int(far_idx[0]), int(far_idx[1])], -0.2,
                               atol=1e-6)


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
