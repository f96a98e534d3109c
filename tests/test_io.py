"""io tests: grid message export layout + weights save/load round-trip."""

import os

import jax
import numpy as np

from grid_vision_tpu.config import GridVisionConfig
from grid_vision_tpu.io.grid_msg import to_occupancy_grid_msg
from grid_vision_tpu.models import weights

CFG = GridVisionConfig()


def test_grid_msg_layout():
    size_x, size_y = CFG.grid_size
    g = np.zeros((size_x, size_y), np.int8)
    g[0, 0] = 100          # buffer (0,0) = max-x, max-y corner
    g[size_x - 1, size_y - 1] = 50  # min corner
    msg = to_occupancy_grid_msg(g, CFG, stamp_ns=123)
    assert msg.width == size_x and msg.height == size_y
    assert msg.frame_id == CFG.base_frame
    np.testing.assert_allclose(msg.origin_xy, (16.0 - 25.0, -10.0))
    # min corner cell -> msg (row 0, col 0); max corner -> last
    assert msg.data[0, 0] == 50
    assert msg.data[size_y - 1, size_x - 1] == 100
    assert msg.flat_data().shape == (size_x * size_y,)
    assert msg.stamp_ns == 123


def test_weights_roundtrip(tmp_path):
    cfg = GridVisionConfig(
        detection_weights_file="/weights/det.npz",
        vision_weights_file="/weights/vis.npz",
        detection_network_input_size=64, network_height=64,
        network_width=64)
    params = weights.init_all(cfg, seed=1)
    weights.save_all(params, cfg, base_dir=str(tmp_path))
    assert os.path.exists(os.path.join(tmp_path, "weights/det.npz"))
    loaded = weights.load_all(cfg, base_dir=str(tmp_path), seed=2)
    # loaded detector equals the SAVED params (seed-1), not the seed-2 init
    orig_leaf = jax.tree_util.tree_leaves(params["detector"])[0]
    load_leaf = jax.tree_util.tree_leaves(loaded["detector"])[0]
    np.testing.assert_array_equal(np.asarray(orig_leaf),
                                  np.asarray(load_leaf))


def test_weights_fallback_to_init(tmp_path):
    cfg = GridVisionConfig(
        detection_weights_file="/weights/missing.npz",
        detection_network_input_size=64, network_height=64,
        network_width=64)
    a = weights.load_all(cfg, base_dir=str(tmp_path), seed=5)
    b = weights.init_all(cfg, seed=5)
    la = jax.tree_util.tree_leaves(a["detector"])[0]
    lb = jax.tree_util.tree_leaves(b["detector"])[0]
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
