"""Spatially-sharded city grid (parallel/city_grid.py): windowed slab
rasterization composes exactly across slab boundaries, and the 8-device
sharded update equals the single-array reference."""

import numpy as np
import jax
import jax.numpy as jnp

from grid_vision_tpu.parallel.city_grid import (CityGrid, CityGridSpec,
                                                city_update,
                                                slab_hit_counts)
from grid_vision_tpu.types import LShapePoses

SPEC = CityGridSpec(length_x=80.0, length_y=20.0, resolution=0.25,
                    center=(0.0, 0.0))   # 320 x 80 cells, 8 x 40-row slabs


def make_poses(entries, capacity=16):
    e = LShapePoses.empty(capacity)
    pos = np.zeros((capacity, 3), np.float32)
    length = np.zeros((capacity,), np.float32)
    width = np.zeros((capacity,), np.float32)
    ok = np.zeros((capacity,), bool)
    for i, (px, py, l_, w_) in enumerate(entries):
        pos[i] = (px, py, 0.0)
        length[i], width[i], ok[i] = l_, w_, True
    return LShapePoses(position=jnp.asarray(pos), quat=e.quat,
                       length=jnp.asarray(length),
                       width=jnp.asarray(width), height=e.height,
                       label=e.label, valid=jnp.asarray(ok))


# boxes chosen to STRADDLE slab boundaries (slab = 10 m of x here)
POSES = make_poses([(-30.0, 2.0, 6.0, 3.0),   # crosses slab 1/2 boundary
                    (0.0, -5.0, 4.0, 2.0),     # center of the map
                    (9.9, 0.0, 8.0, 4.0),      # wide, crosses two slabs
                    (35.0, 7.0, 2.0, 2.0)])    # near the far edge


def test_slab_counts_compose_to_full():
    h, w = SPEC.shape
    full = np.asarray(slab_hit_counts(POSES, SPEC, 0, h))
    assert full.sum() > 0
    n_slabs = 8
    slab_h = h // n_slabs
    stitched = np.concatenate([
        np.asarray(slab_hit_counts(POSES, SPEC, i * slab_h, slab_h))
        for i in range(n_slabs)], axis=0)
    np.testing.assert_array_equal(stitched, full)


def test_sharded_update_matches_reference():
    cg = CityGrid(SPEC)
    lo0 = cg.init_grid()
    lo, occ = cg.update(lo0, POSES)
    ref_lo, ref_occ = city_update(jnp.zeros(SPEC.shape), POSES, SPEC)
    np.testing.assert_array_equal(np.asarray(lo), np.asarray(ref_lo))
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(ref_occ))
    # every box landed: four disjoint footprints
    assert (np.asarray(lo) > 0).sum() > 0


def test_update_math_matches_local_rasterizer_constants():
    """Same decay/hit/clamp/sigmoid chain as ops/rasterize (per-cell)."""
    lo0 = jnp.full(SPEC.shape, 1.0)
    lo, occ = city_update(lo0, make_poses([]), SPEC)
    np.testing.assert_allclose(np.asarray(lo),
                               1.0 + SPEC.log_odds_decay, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(occ), 1.0 / (1.0 + np.exp(-(1.0 + SPEC.log_odds_decay))),
        atol=1e-6)


def test_persistence_across_ticks():
    cg = CityGrid(SPEC)
    lo = cg.init_grid()
    for _ in range(3):
        lo, occ = cg.update(lo, POSES)
    m = np.asarray(lo)
    assert m.max() > 2 * SPEC.log_odds_hit  # evidence accumulated
    assert m.min() >= SPEC.min_log_odds


def test_city_fusion_rigs_to_world_map():
    """End-to-end: 8 fake rigs (rig-sharded) place objects at distinct
    world positions; the row-sharded city grid shows each at the right
    slab."""
    import jax
    from grid_vision_tpu.config import GridVisionConfig
    from grid_vision_tpu.parallel.city_grid import CityFusion
    from grid_vision_tpu.parallel.mesh import rig_mesh
    from grid_vision_tpu.types import Extrinsics, Obs

    cfg = GridVisionConfig(max_points=256, camera_image_height=32,
                           camera_image_width=32, fx=16.0, fy=16.0,
                           cx=16.0, cy=16.0, grid_x=24, grid_y=12,
                           resolution=0.25)
    n = 8

    def fake_poses(params, obs, extr, c, key):
        # each rig reports one 2x2 m box at world x = -32 + rig*8
        rig = obs.image[0, 0, 0].astype(jnp.float32)
        e = LShapePoses.empty(4)
        return LShapePoses(
            position=e.position.at[0, 0].set(-32.0 + rig * 8.0),
            quat=e.quat,
            length=e.length.at[0].set(2.0),
            width=e.width.at[0].set(2.0),
            height=e.height, label=e.label,
            valid=e.valid.at[0].set(True))

    cf = CityFusion(SPEC, cfg, n_rigs=n, mesh=rig_mesh(),
                    params={}, poses_fn=fake_poses)
    obs = jax.vmap(lambda i: Obs.create(cfg))(jnp.arange(n))
    obs = Obs(image=obs.image.at[:, 0, 0, 0].set(
        jnp.arange(n, dtype=jnp.float32)),
        cloud=obs.cloud, has_image=jnp.ones((n,), bool),
        has_cloud=jnp.ones((n,), bool))
    extr = jax.vmap(lambda _: Extrinsics.identity())(jnp.arange(n))
    lo, occ = cf.step(cf.init_grid(), obs, extr, jax.random.PRNGKey(0))
    lo = np.asarray(lo)
    h, w = SPEC.shape
    # every rig's box must appear: one cluster per 8 m of world x
    for rig in range(n):
        x_world = -32.0 + rig * 8.0
        row = int((SPEC.length_x / 2 - x_world) / SPEC.resolution)
        row = min(max(row, 1), h - 2)
        window = lo[max(0, row - 8):row + 8]
        assert (window > 0).any(), f"rig {rig} box missing at row {row}"
