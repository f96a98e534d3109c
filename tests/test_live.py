"""Live ingest loop tests: mailbox-fed engine stepping with latest-wins
and missing-sensor (Q1 gate) semantics."""

import numpy as np

from grid_vision_tpu.config import GridVisionConfig
from grid_vision_tpu.demo import default_extrinsics
from grid_vision_tpu.io.scene import SyntheticScene
from grid_vision_tpu.pipeline import Engine
from grid_vision_tpu.runtime import native
from grid_vision_tpu.runtime.live import LiveSource, spin

CFG = GridVisionConfig(use_vision_orientation=False, max_points=2048,
                       compute_dtype="float32",
                       camera_image_height=480, camera_image_width=640)


def make_source():
    return LiveSource(cfg=CFG, image_box=native.Mailbox(),
                      cloud_box=native.Mailbox())


def test_poll_empty_then_latest_wins(rng):
    src = make_source()
    obs = src.poll()
    assert not bool(obs.has_image) and not bool(obs.has_cloud)

    img1 = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
    img2 = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
    src.publish_image(img1, 1)
    src.publish_image(img2, 2)
    xyz = rng.uniform(-5, 5, (100, 3)).astype(np.float32)
    src.publish_cloud(xyz)
    obs = src.poll()
    assert bool(obs.has_image) and bool(obs.has_cloud)
    np.testing.assert_array_equal(np.asarray(obs.image), img2)  # latest
    assert int(obs.cloud.count) == 100
    np.testing.assert_allclose(np.asarray(obs.cloud.xyz)[:100], xyz)


def test_spin_steps_engine():
    eng = Engine(CFG, extrinsics=default_extrinsics(), seed=0)
    src = make_source()
    scene = SyntheticScene(CFG, seed=0, n_ground=500)
    scene.add_default_traffic()
    src.publish_image(scene.image_at(0.0).astype(np.uint8))
    src.publish_cloud(scene.cloud_at(0.0))

    grids = []
    state = spin(eng, src, period_s=0.0, max_steps=3,
                 on_step=lambda i, s, o: grids.append(
                     np.asarray(o.occupancy_i8)))
    assert int(state.step) == 3
    assert len(grids) == 3
    # inputs present + no detections (random net) -> decay happened
    lo = np.asarray(state.log_odds)
    np.testing.assert_allclose(lo, -0.6, atol=1e-5)


def test_spin_gate_without_inputs():
    eng = Engine(CFG, extrinsics=default_extrinsics(), seed=0)
    src = make_source()
    state = spin(eng, src, period_s=0.0, max_steps=2)
    # Q1: both inputs missing -> no update at all
    np.testing.assert_array_equal(np.asarray(state.log_odds), 0.0)
