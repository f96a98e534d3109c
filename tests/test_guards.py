"""Failure-detection tests: input validation, health checks, recovery."""

import jax.numpy as jnp
import numpy as np
import pytest

from grid_vision_tpu.config import GridVisionConfig
from grid_vision_tpu.types import GridState, Obs, PointCloud
from grid_vision_tpu.utils import guards

CFG = GridVisionConfig(max_points=1024)


def test_validate_obs_rejects_wrong_shapes():
    bad = Obs(image=jnp.zeros((100, 100, 3)),
              cloud=PointCloud.empty(CFG.max_points),
              has_image=jnp.asarray(True), has_cloud=jnp.asarray(False))
    with pytest.raises(guards.InputError, match="image shape"):
        guards.validate_obs(bad, CFG)
    bad2 = Obs(image=jnp.zeros((480, 640, 3)),
               cloud=PointCloud.empty(64),
               has_image=jnp.asarray(True), has_cloud=jnp.asarray(False))
    with pytest.raises(guards.InputError, match="capacity"):
        guards.validate_obs(bad2, CFG)
    guards.validate_obs(Obs.create(CFG), CFG)  # well-formed passes


def test_health_check_and_recovery():
    state = GridState.create(CFG)
    report = guards.check_state(state)
    assert report.ok and report.occupied_cells == 0

    poisoned = GridState(
        log_odds=state.log_odds.at[5, 5].set(jnp.nan).at[1, 1].set(2.0),
        occupancy=state.occupancy, rng=state.rng, step=state.step)
    report = guards.check_state(poisoned)
    assert not report.ok

    healed = guards.recover_state(poisoned, CFG)
    lo = np.asarray(healed.log_odds)
    assert np.isfinite(lo).all()
    assert lo[5, 5] == CFG.log_odds_prior   # poisoned cell reset
    assert lo[1, 1] == 2.0                  # healthy cell preserved
    occ = np.asarray(healed.occupancy)
    np.testing.assert_allclose(occ[1, 1], 1 / (1 + np.exp(-2.0)),
                               rtol=1e-6)
