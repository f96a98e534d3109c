"""Multi-rig shared-grid fusion (parallel/shared_grid.py): hit-count
rasterization, additive multi-sensor evidence, psum over the 8-device
mesh, and single-rig bit-equality with the plain rasterizer."""

import numpy as np
import jax
import jax.numpy as jnp

from grid_vision_tpu.config import GridVisionConfig
from grid_vision_tpu.ops import rasterize
from grid_vision_tpu.parallel.shared_grid import (SharedGrid,
                                                  shared_grid_step)
from grid_vision_tpu.types import Extrinsics, LShapePoses, Obs

CFG = GridVisionConfig(max_points=256, camera_image_height=32,
                       camera_image_width=32, fx=16.0, fy=16.0, cx=16.0,
                       cy=16.0, grid_x=24, grid_y=12, resolution=0.25)


def make_poses(entries, capacity=8):
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


RIG_POSES = [
    make_poses([(5.0, 1.0, 2.0, 1.0)]),            # rig 0 sees box A
    make_poses([(5.0, 1.0, 2.0, 1.0),              # rig 1 sees A and B
                (10.0, -2.0, 1.0, 1.0)]),
]


def _fake_poses_factory(n_rigs):
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *(RIG_POSES[i % 2] for i in range(n_rigs)))

    def fake(params, obs, extr, cfg, key):
        # identify the rig by the marker value planted in its image
        rig = obs.image[0, 0, 0].astype(jnp.int32)
        return jax.tree_util.tree_map(lambda x: x[rig], stacked)

    return fake


def _obs_batch(n_rigs):
    obs = jax.vmap(lambda i: Obs.create(CFG))(jnp.arange(n_rigs))
    img = obs.image.at[:, 0, 0, 0].set(jnp.arange(n_rigs, dtype=jnp.float32))
    return Obs(image=img, cloud=obs.cloud,
               has_image=jnp.ones((n_rigs,), bool),
               has_cloud=jnp.ones((n_rigs,), bool))


def _extr_batch(n_rigs):
    return jax.vmap(lambda _: Extrinsics.identity())(jnp.arange(n_rigs))


def test_hit_counts_match_block_increment():
    poses = RIG_POSES[1]
    counts = np.asarray(rasterize.lshape_hit_counts(poses, CFG))
    lo, _ = rasterize.lshape_update(
        jnp.zeros(CFG.grid_size), poses, CFG)
    expect = CFG.log_odds_decay + CFG.log_odds_hit * counts
    np.testing.assert_allclose(
        np.asarray(lo), np.clip(expect, CFG.min_log_odds,
                                CFG.max_log_odds), atol=1e-6)


def test_multi_rig_evidence_accumulates():
    n = 2
    lo0 = jnp.zeros(CFG.grid_size)
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    lo, occ, _d = shared_grid_step(
        {}, lo0, _obs_batch(n), _extr_batch(n), keys, CFG,
        poses_fn=_fake_poses_factory(n))
    lo = np.asarray(lo)
    c0 = np.asarray(rasterize.lshape_hit_counts(RIG_POSES[0], CFG))
    c1 = np.asarray(rasterize.lshape_hit_counts(RIG_POSES[1], CFG))
    expect = np.clip(CFG.log_odds_decay + CFG.log_odds_hit * (c0 + c1),
                     CFG.min_log_odds, CFG.max_log_odds)
    np.testing.assert_allclose(lo, expect, atol=1e-6)
    # the doubly-observed box A carries twice the evidence of B
    assert lo.max() > CFG.log_odds_hit * 1.5


def test_single_rig_matches_plain_rasterizer():
    lo0 = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, CFG.grid_size)
        .astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(0), 1)
    lo, occ, _d = shared_grid_step(
        {}, lo0, _obs_batch(1), _extr_batch(1), keys, CFG,
        poses_fn=_fake_poses_factory(1))
    ref_lo, ref_occ = rasterize.lshape_update(lo0, RIG_POSES[0], CFG)
    np.testing.assert_array_equal(np.asarray(lo), np.asarray(ref_lo))
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(ref_occ))


def test_sharded_matches_unsharded():
    """8 rigs over the 8-device mesh (one psum) == the plain vmap sum."""
    n = 8
    sg = SharedGrid(CFG, n_rigs=n, poses_fn=_fake_poses_factory(n),
                    params={})
    obs_b, extr_b = _obs_batch(n), _extr_batch(n)
    lo, occ, _d = sg(sg.init_grid(), obs_b, extr_b, jax.random.PRNGKey(0))
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    ref_lo, ref_occ, _d2 = shared_grid_step(
        {}, sg.init_grid(), obs_b, extr_b, keys, CFG,
        poses_fn=_fake_poses_factory(n))
    np.testing.assert_allclose(np.asarray(lo), np.asarray(ref_lo),
                               atol=1e-6)
    assert np.isfinite(np.asarray(occ)).all()


def test_budget_path_matches_per_rig_with_full_budget():
    """Fleet-compacted orientation inside the shared grid (budget >=
    rigs*cap) agrees with the per-rig path, end-to-end with real
    weights and detections."""
    cfg = GridVisionConfig(
        detection_weights_file="weights/detector.npz",
        vision_weights_file="weights/orientation.npz",
        max_points=2048, compute_dtype="float32")
    from grid_vision_tpu.io.scene import SyntheticScene
    from grid_vision_tpu.runtime.stream import obs_from_scene
    from grid_vision_tpu.types import tree_stack
    from grid_vision_tpu.models import weights as weights_mod

    params = weights_mod.load_all(cfg, seed=0)
    obs_list = []
    for r in range(2):
        scene = SyntheticScene(cfg, seed=r, n_ground=1500)
        scene.add_default_traffic()
        obs_list.append(obs_from_scene(scene, 0.3, cfg))
    obs_b = tree_stack(obs_list)
    extr_b = _extr_batch(2)
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    lo0 = jnp.zeros(cfg.grid_size)
    lo_a, _, _da = shared_grid_step(params, lo0, obs_b, extr_b, keys,
                                    cfg)
    lo_b, _, db = shared_grid_step(
        params, lo0, obs_b, extr_b, keys, cfg,
        orientation_budget=2 * cfg.max_orientation_batch)
    a, b = np.asarray(lo_a), np.asarray(lo_b)
    assert (a != lo0[0, 0]).any() or a.any()   # something rasterized
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_chunk_matches_k_sequential_steps():
    """call_chunk(K ticks) must be semantically identical to K
    sequential __call__-style ticks with the same key schedule (the
    scan-chained throughput path, VERDICT r2 #4)."""
    n, k = 8, 3
    sg = SharedGrid(CFG, n_rigs=n, poses_fn=_fake_poses_factory(n),
                    params={})
    obs_b, extr_b = _obs_batch(n), _extr_batch(n)
    obs_c = jax.tree_util.tree_map(
        lambda x: jnp.stack([x] * k), obs_b)
    key = jax.random.PRNGKey(42)
    lo_c, occ_c, d_c = sg.call_chunk(sg.init_grid(), obs_c, extr_b, key)

    # reference: K sequential single-tick dispatches with the chunk's
    # exact key schedule (split K, then per rig)
    keys_c = jax.vmap(lambda kk: jax.random.split(kk, n))(
        jax.random.split(key, k))
    lo = sg.init_grid()
    assert occ_c.shape[0] == k   # one materialized grid PER tick
    for t in range(k):
        obs_t = jax.tree_util.tree_map(lambda x: x[t], obs_c)
        lo, occ, _ = sg._step(sg.params, lo, obs_t, extr_b, keys_c[t])
        np.testing.assert_allclose(np.asarray(occ_c[t]), np.asarray(occ),
                                   atol=1e-6)
    np.testing.assert_allclose(np.asarray(lo_c), np.asarray(lo),
                               atol=1e-6)
    assert int(d_c) == 0


def test_serve_shared_chunked_smoke():
    """serve --shared --chunk: the hub publishes world grids at the
    chunk cadence and the grid accumulates evidence."""
    import threading
    import time as _time
    from grid_vision_tpu.runtime import native
    from grid_vision_tpu.runtime.serve import (FleetServer,
                                               selftest_producers)
    from grid_vision_tpu.runtime.session import GRID_CHANNEL, _decode_grid
    from jax.sharding import Mesh

    cfg = GridVisionConfig(max_points=2048, camera_image_height=96,
                           camera_image_width=128, fx=64.0, fy=64.0,
                           cx=64.0, cy=48.0, grid_x=24, grid_y=12,
                           resolution=0.25)
    mesh = Mesh(np.array(jax.devices()[:2]), ("rig",))
    name = "gvtest-hub-chunk"
    server = FleetServer(name, cfg, n_rigs=2, mesh=mesh, shared=True,
                         chunk=4)
    stop = threading.Event()
    try:
        selftest_producers(name, cfg, 2, hz=50.0, stop=stop)
        _time.sleep(0.3)
        server.spin(steps=8, hz=200.0)   # 8 polls -> 2 chunk dispatches
        box = native.ShmMailbox(
            native.shm_path(f"{name}-world", GRID_CHANNEL))
        frame = box.read()
        box.close()
        assert frame is not None, "no world grid published"
        grid, step, _ = _decode_grid(frame[0])
        assert grid.shape == cfg.grid_size
        lo = np.asarray(server.world_lo)
        assert np.isfinite(lo).all() and not np.allclose(lo, 0.0)
    finally:
        stop.set()
        server.close()
