"""Fused Pallas raycast+grid kernel vs the XLA chain: bit-equality.

Mirrors tests/test_pallas_grid.py for the extension-mode update
(raycast.lshape_update_with_carving): both paths consume the identical
range_profile / cell_polar_maps arrays, so the fused kernel must agree
cell-for-cell (interpret mode off-TPU).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from grid_vision_tpu.config import GridVisionConfig
from grid_vision_tpu.ops import raycast
from grid_vision_tpu.ops.pallas_raycast import (
    lshape_update_with_carving_pallas)
from grid_vision_tpu.types import LShapePoses

CFG = GridVisionConfig(compat=False, raycast_free_space=True)


def random_case(seed, n_pts=600, n_boxes=6, cfg=CFG):
    rng = np.random.default_rng(seed)
    lo = rng.normal(0, 1.5, cfg.grid_size).astype(np.float32)
    origin = np.array([0.0, 0.0], np.float32)
    pts = np.stack([rng.uniform(-20, 45, n_pts),
                    rng.uniform(-9, 9, n_pts)], -1).astype(np.float32)
    valid = rng.random(n_pts) < 0.9
    cap = 8
    empty = LShapePoses.empty(cap)
    pos = np.zeros((cap, 3), np.float32)
    length = np.zeros((cap,), np.float32)
    width = np.zeros((cap,), np.float32)
    ok = np.zeros((cap,), bool)
    for i in range(n_boxes):
        pos[i] = (rng.uniform(-5, 35), rng.uniform(-8, 8), 0.0)
        length[i] = rng.uniform(1, 5)
        width[i] = rng.uniform(1, 3)
        ok[i] = True
    poses = LShapePoses(position=jnp.asarray(pos), quat=empty.quat,
                        length=jnp.asarray(length),
                        width=jnp.asarray(width), height=empty.height,
                        label=empty.label, valid=jnp.asarray(ok))
    return (jnp.asarray(lo), poses, jnp.asarray(origin),
            jnp.asarray(pts), jnp.asarray(valid))


def test_fused_carve_bit_equal_xla():
    """Kernel vs XLA from IDENTICAL concrete polar maps -> bit-equal.
    (The maps themselves are computed once: recomputing them inside two
    separately-compiled programs can differ by 1 ulp via fusion/FMA
    choices, which flips boundary cells — covered by the tolerance test
    below.)"""
    from grid_vision_tpu.ops.pallas_raycast import fused_carve_update
    for seed in range(4):
        lo, poses, origin, pts, valid = random_case(seed)
        ranges = np.asarray(raycast.range_profile(origin, pts, valid))
        cbin, cr = raycast.cell_polar_maps(origin, CFG)
        cbin, cr = np.asarray(cbin), np.asarray(cr)
        ref_lo, ref_occ = raycast.carve_update_from_maps(
            lo, poses, jnp.asarray(ranges), jnp.asarray(cbin),
            jnp.asarray(cr), CFG)
        got_lo, got_occ = fused_carve_update(
            lo, poses, jnp.asarray(ranges), jnp.asarray(cbin),
            jnp.asarray(cr), CFG)
        np.testing.assert_array_equal(np.asarray(ref_lo),
                                      np.asarray(got_lo))
        np.testing.assert_array_equal(np.asarray(ref_occ),
                                      np.asarray(got_occ))


def test_fused_carve_production_near_equal():
    """Full production paths (each computes its own maps): agreement on
    >= 99.9% of cells; any differing cell is a carve-boundary flip
    (|delta| <= |free| + ulp)."""
    for seed in range(4):
        lo, poses, origin, pts, valid = random_case(seed)
        ref_lo, _ = raycast.lshape_update_with_carving(
            lo, poses, origin, pts, valid, CFG)
        got_lo, _ = lshape_update_with_carving_pallas(
            lo, poses, origin, pts, valid, CFG)
        ref, got = np.asarray(ref_lo), np.asarray(got_lo)
        diff = ref != got
        assert diff.mean() <= 1e-3, diff.mean()
        if diff.any():
            assert np.abs(ref - got)[diff].max() <= 0.4 + 1e-5


def test_fused_carve_no_points_is_decay_plus_hits():
    lo, poses, origin, pts, valid = random_case(7)
    none = jnp.zeros_like(valid)
    ref_lo, _ = raycast.lshape_update_with_carving(
        lo, poses, origin, pts, none, CFG)
    got_lo, _ = lshape_update_with_carving_pallas(
        lo, poses, origin, pts, none, CFG)
    np.testing.assert_array_equal(np.asarray(ref_lo), np.asarray(got_lo))


def test_pipeline_backend_dispatch():
    """grid_backend='pallas' + raycast routes through the fused kernel
    and matches the XLA engine step exactly."""
    import functools

    import jax

    from grid_vision_tpu import pipeline
    from grid_vision_tpu.demo import default_extrinsics, oracle_boxes
    from grid_vision_tpu.io.scene import SyntheticScene
    from grid_vision_tpu.runtime.stream import obs_from_scene

    base = dict(compat=False, raycast_free_space=True,
                use_vision_orientation=False, max_points=2048,
                compute_dtype="float32", camera_image_height=96,
                camera_image_width=128, fx=64.0, fy=64.0, cx=64.0,
                cy=48.0)
    cfg_x = GridVisionConfig(**base, grid_backend="xla")
    cfg_p = GridVisionConfig(**base, grid_backend="pallas")
    eng_x = pipeline.Engine(cfg_x, extrinsics=default_extrinsics(), seed=0)
    eng_p = pipeline.Engine(cfg_p, extrinsics=default_extrinsics(), seed=0)
    scene = SyntheticScene(cfg_x, seed=0, n_ground=1500)
    scene.add_default_traffic()
    fuse_x = jax.jit(functools.partial(pipeline.fuse, cfg=cfg_x))
    fuse_p = jax.jit(functools.partial(pipeline.fuse, cfg=cfg_p))
    sx, sp = eng_x.init_state(), eng_p.init_state()
    for i in range(2):
        obs = obs_from_scene(scene, i / 10.0, cfg_x)
        boxes = oracle_boxes(scene, i / 10.0, cfg_x)
        sx, _ = fuse_x(eng_x.params, sx, obs, boxes, eng_x.extrinsics)
        sp, _ = fuse_p(eng_p.params, sp, obs, boxes, eng_p.extrinsics)
    np.testing.assert_array_equal(np.asarray(sx.log_odds),
                                  np.asarray(sp.log_odds))
