"""Multi-device tests on the virtual 8-CPU mesh: rig fleet sharding and
the dp x tp sharded train step."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from grid_vision_tpu.config import GridVisionConfig
from grid_vision_tpu.models import yolov4_tiny
from grid_vision_tpu.parallel import Fleet, make_mesh, shard_params
from grid_vision_tpu.parallel.mesh import replicate, rig_mesh
from grid_vision_tpu.train import trainer
from grid_vision_tpu.types import Obs, PointCloud, tree_stack

TINY = GridVisionConfig(
    max_points=256, max_candidates=32, max_detections=8,
    max_orientation_batch=2, max_points_per_box=64,
    camera_image_height=64, camera_image_width=96,
    detection_network_input_size=32, network_height=32, network_width=32,
    ransac_iters=16, compute_dtype="float32", use_vision_orientation=False)


def make_obs(rng, cfg, n):
    return tree_stack([
        Obs(image=jnp.asarray(rng.uniform(0, 255, (64, 96, 3)), jnp.float32),
            cloud=PointCloud.from_numpy(
                rng.uniform([-5, -2, 1], [5, 2, 30],
                            size=(128, 3)).astype(np.float32),
                None, cfg.max_points),
            has_image=jnp.asarray(True), has_cloud=jnp.asarray(True))
        for _ in range(n)])


def test_fleet_8_devices():
    assert len(jax.devices()) == 8
    n_rigs = 16
    fleet = Fleet(TINY, n_rigs=n_rigs, seed=0)
    states = fleet.init_states()
    # rig-sharded: each device holds 2 rigs' grids
    shards = states.log_odds.sharding.device_set
    assert len(shards) == 8
    rng = np.random.default_rng(0)
    obs = fleet.shard_obs(make_obs(rng, TINY, n_rigs))
    states2, outs = fleet(states, obs)
    assert states2.log_odds.shape == (n_rigs,) + TINY.grid_size
    assert int(np.asarray(states2.step).min()) == 1
    # independent rigs: each grid decayed (no detections w/ random net)
    lo = np.asarray(states2.log_odds)
    assert (lo <= 0.86).all()


def test_fleet_compacted_step_matches_vmap():
    """Fleet.compacted_step (pipeline.fleet_step per shard, the bench
    headline path) must equal plain vmap(step) when the per-shard
    budget covers the dynamic load — and must run the fused Pallas stem
    per shard (interpret mode here) without the vmap fallback."""
    import dataclasses

    cfg = dataclasses.replace(TINY, use_vision_orientation=True)
    n_rigs = 8
    fleet = Fleet(cfg, n_rigs=n_rigs, seed=0)
    rng = np.random.default_rng(3)
    obs = fleet.shard_obs(make_obs(rng, cfg, n_rigs))
    s_ref, _ = fleet(fleet.init_states(), obs)
    # budget_per_rig = max_orientation_batch covers everything -> equal
    s_c, outs = fleet.compacted_step(fleet.init_states(), obs,
                                     budget_per_rig=cfg.max_orientation_batch)
    np.testing.assert_array_equal(np.asarray(s_c.log_odds),
                                  np.asarray(s_ref.log_odds))

    cfg_p = dataclasses.replace(cfg, detector_stem_backend="pallas")
    fleet_p = Fleet(cfg_p, n_rigs=n_rigs, seed=0)
    s_p, _ = fleet_p.compacted_step(
        fleet_p.init_states(), obs,
        budget_per_rig=cfg.max_orientation_batch)
    # pallas stem differs from XLA only at float rounding
    np.testing.assert_allclose(np.asarray(s_p.log_odds),
                               np.asarray(s_ref.log_odds),
                               atol=1e-3)


def test_fleet_matches_single_rig():
    """A rig in the fleet must produce bit-identical grids to the same
    rig stepped alone (pure data parallelism, no cross-rig effects)."""
    from grid_vision_tpu import pipeline
    n_rigs = 8
    fleet = Fleet(TINY, n_rigs=n_rigs, seed=0)
    rng = np.random.default_rng(1)
    obs = make_obs(rng, TINY, n_rigs)
    states = fleet.init_states()
    states2, _ = fleet(fleet.init_states(), fleet.shard_obs(obs))

    single = jax.jit(functools.partial(pipeline.step, cfg=TINY))
    rig3_state = jax.tree_util.tree_map(lambda x: x[3], states)
    rig3_obs = jax.tree_util.tree_map(lambda x: x[3], obs)
    s2, _ = single(fleet.params, rig3_state, rig3_obs, fleet.extrinsics)
    np.testing.assert_array_equal(np.asarray(states2.log_odds[3]),
                                  np.asarray(s2.log_odds))


def test_sharded_train_step_dp_tp():
    mesh = make_mesh(8, ("dp", "tp"), tp=2)
    ycfg = yolov4_tiny.YoloConfig(input_size=32, compute_dtype=jnp.float32)
    tx = optax.sgd(1e-2)
    state = trainer.init_train_state("yolo", ycfg, tx, jax.random.PRNGKey(0))
    with mesh:
        params = shard_params(state.variables["params"], mesh)
        state = trainer.TrainState(
            variables={"params": params,
                       "batch_stats": replicate(
                           state.variables["batch_stats"], mesh)},
            opt_state=state.opt_state, step=state.step)
        train_step = trainer.make_train_step("yolo", ycfg, tx, mesh)
        b = 8
        n = ycfg.num_anchors_total
        images = jax.random.uniform(jax.random.PRNGKey(1), (b, 32, 32, 3))
        tgt_boxes = jnp.tile(jnp.asarray([[0.2, 0.2, 0.6, 0.6]]),
                             (b, n, 1))
        tgt_class = jnp.zeros((b, n), jnp.int32)
        tgt_pos = jnp.zeros((b, n)).at[:, 0].set(1.0)
        losses = []
        for i in range(3):
            state, metrics = train_step(state, images, tgt_boxes,
                                        tgt_class, tgt_pos)
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0]  # it actually optimizes
        assert int(state.step) == 3


def test_tp_sharding_applied():
    mesh = make_mesh(8, ("dp", "tp"), tp=2)
    ycfg = yolov4_tiny.YoloConfig(input_size=32, compute_dtype=jnp.float32)
    variables = yolov4_tiny.init_params(jax.random.PRNGKey(0), ycfg)
    params = shard_params(variables["params"], mesh)
    # find a wide conv kernel and confirm it is sharded over tp
    leaves = jax.tree_util.tree_leaves_with_path(params)
    wide = [(p, l) for p, l in leaves
            if hasattr(l, "shape") and l.ndim == 4 and l.shape[-1] >= 128]
    assert wide
    sharded = [l for _, l in wide
               if len(l.sharding.device_set) == 8]
    assert sharded, "no wide kernel was tp-sharded"


def test_fleet_run_and_checkpoint(tmp_path):
    import os
    n_rigs = 8
    fleet = Fleet(TINY, n_rigs=n_rigs, seed=0)
    rng = np.random.default_rng(2)
    obs = fleet.shard_obs(make_obs(rng, TINY, n_rigs))
    states = fleet.init_states()
    states = fleet.run(states, obs, steps=3)
    assert int(np.asarray(states.step).min()) == 3
    path = os.path.join(tmp_path, "fleet.npz")
    fleet.save_states(states, path)
    restored = fleet.restore_states(path)
    np.testing.assert_array_equal(np.asarray(restored.log_odds),
                                  np.asarray(states.log_odds))
    assert len(restored.log_odds.sharding.device_set) == 8
