"""Pallas fused grid kernel must be bit-equal to the XLA rasterizer
(runs interpreted on CPU; compiled on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from grid_vision_tpu.config import GridVisionConfig
from grid_vision_tpu.ops import rasterize
from grid_vision_tpu.ops.pallas_grid import lshape_update_pallas
from grid_vision_tpu.types import GridState, LShapePoses

CFG = GridVisionConfig()


def make_poses(entries, capacity=16):
    p = LShapePoses.empty(capacity)
    pos = np.zeros((capacity, 3), np.float32)
    length = np.zeros((capacity,), np.float32)
    width = np.zeros((capacity,), np.float32)
    valid = np.zeros((capacity,), bool)
    for i, e in enumerate(entries):
        pos[i] = (e["px"], e["py"], 0.0)
        length[i] = e["length"]
        width[i] = e["width"]
        valid[i] = True
    return LShapePoses(position=jnp.asarray(pos), quat=p.quat,
                       length=jnp.asarray(length), width=jnp.asarray(width),
                       height=p.height, label=p.label,
                       valid=jnp.asarray(valid))


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_matches_xla(seed):
    rng = np.random.default_rng(seed)
    state = GridState.create(CFG)
    lo_xla = state.log_odds
    lo_pal = state.log_odds
    for _ in range(3):
        entries = [{
            "px": float(rng.uniform(-15, 50)),
            "py": float(rng.uniform(-15, 15)),
            "length": float(rng.uniform(0.3, 6.0)),
            "width": float(rng.uniform(0.3, 3.0)),
        } for _ in range(int(rng.integers(0, 6)))]
        poses = make_poses(entries)
        lo_xla, occ_xla = rasterize.lshape_update(lo_xla, poses, CFG)
        lo_pal, occ_pal = lshape_update_pallas(lo_pal, poses, CFG)
    np.testing.assert_array_equal(np.asarray(lo_pal), np.asarray(lo_xla))
    np.testing.assert_allclose(np.asarray(occ_pal), np.asarray(occ_xla),
                               atol=1e-7)


def test_pallas_empty_poses_is_decay():
    state = GridState.create(CFG)
    lo, occ = lshape_update_pallas(state.log_odds,
                                   LShapePoses.empty(16), CFG)
    np.testing.assert_allclose(np.asarray(lo), CFG.log_odds_decay,
                               atol=1e-7)
