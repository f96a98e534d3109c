"""Multi-fleet orchestration (parallel/multi_fleet.py): independent
fleets on disjoint device groups of the 8-device virtual mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from grid_vision_tpu.config import GridVisionConfig
from grid_vision_tpu.parallel import Fleet, MultiFleet
from grid_vision_tpu.types import Obs, PointCloud, tree_stack

TINY = GridVisionConfig(
    max_points=256, max_candidates=32, max_detections=8,
    max_orientation_batch=2, max_points_per_box=64,
    camera_image_height=64, camera_image_width=96,
    detection_network_input_size=32, network_height=32, network_width=32,
    ransac_iters=16, compute_dtype="float32", use_vision_orientation=False)


def make_obs(rng, cfg, n):
    return tree_stack([
        Obs(image=jnp.asarray(rng.uniform(0, 255, (64, 96, 3)),
                              jnp.float32),
            cloud=PointCloud.from_numpy(
                rng.uniform([-5, -2, 1], [5, 2, 30],
                            size=(128, 3)).astype(np.float32),
                None, cfg.max_points),
            has_image=jnp.asarray(True), has_cloud=jnp.asarray(True))
        for _ in range(n)])


def test_disjoint_groups_and_heterogeneous_configs():
    # fleet 1 runs a DIFFERENT grid geometry than fleet 0 — heterogeneous
    # deployments in one orchestrator
    cfg_b = dataclasses.replace(TINY, grid_x=30, grid_y=10)
    mf = MultiFleet([TINY, cfg_b], rigs_per_fleet=4)
    assert mf.n_fleets == 2
    d0, d1 = (set(g) for g in mf.device_groups)
    assert d0.isdisjoint(d1)
    assert len(d0) == len(d1) == 4

    states = mf.init_states()
    assert states[0].log_odds.shape == (4,) + TINY.grid_size
    assert states[1].log_odds.shape == (4,) + cfg_b.grid_size
    # each fleet's grids live only on its group's devices
    assert set(states[0].log_odds.sharding.device_set) <= d0
    assert set(states[1].log_odds.sharding.device_set) <= d1

    rng = np.random.default_rng(0)
    obs = mf.shard_obs([make_obs(rng, TINY, 4), make_obs(rng, cfg_b, 4)])
    states, outs = mf.step_all(states, obs)
    assert int(np.asarray(states[0].step).min()) == 1
    assert int(np.asarray(states[1].step).min()) == 1
    tel = mf.telemetry(outs)
    assert set(tel) == {"fleet0", "fleet1"}
    assert all(v["prenms_overflow"] >= 0 for v in tel.values())


def test_multi_fleet_matches_single_fleet():
    """A fleet inside the orchestrator computes exactly what the same
    fleet computes alone (same seed, same obs)."""
    mf = MultiFleet([TINY, TINY], rigs_per_fleet=4, seed=0)
    rng = np.random.default_rng(1)
    obs_np = make_obs(rng, TINY, 4)
    states = mf.init_states(seed=0)
    obs = mf.shard_obs([obs_np, obs_np])
    (s0, _s1), _ = mf.step_all(states, obs)

    solo = Fleet(TINY, n_rigs=4,
                 mesh=mf.fleets[0].mesh, seed=0)
    s_solo, _ = solo(solo.init_states(seed=0), solo.shard_obs(obs_np))
    np.testing.assert_allclose(np.asarray(s0.log_odds),
                               np.asarray(s_solo.log_odds), atol=1e-6)


def test_run_all_scan_chunks():
    mf = MultiFleet([TINY, TINY], rigs_per_fleet=4, seed=0)
    rng = np.random.default_rng(2)
    states = mf.init_states()
    obs = mf.shard_obs([make_obs(rng, TINY, 4), make_obs(rng, TINY, 4)])
    states = mf.run_all(states, obs, steps=3)
    assert int(np.asarray(states[0].step).min()) == 3
    assert int(np.asarray(states[1].step).min()) == 3
