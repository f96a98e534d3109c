"""Per-stage telemetry (runtime/timing.TimedEngine): the 3-dispatch
observability mode produces the same grid as the fused step."""

import numpy as np

from grid_vision_tpu import pipeline
from grid_vision_tpu.config import GridVisionConfig
from grid_vision_tpu.demo import default_extrinsics
from grid_vision_tpu.io.scene import SyntheticScene
from grid_vision_tpu.runtime.stream import obs_from_scene
from grid_vision_tpu.runtime.timing import TimedEngine


def test_timed_step_matches_fused_grid():
    cfg = GridVisionConfig(max_points=2048, camera_image_height=96,
                           camera_image_width=128, fx=64.0, fy=64.0,
                           cx=64.0, cy=48.0, grid_x=24, grid_y=12,
                           resolution=0.25,
                           use_vision_orientation=False)
    eng_a = pipeline.Engine(cfg, extrinsics=default_extrinsics(), seed=0)
    eng_b = pipeline.Engine(cfg, extrinsics=default_extrinsics(), seed=0)
    timed = TimedEngine(eng_b)
    scene = SyntheticScene(cfg, seed=0, n_ground=1500)
    scene.add_default_traffic()
    sa, sb = eng_a.init_state(), eng_b.init_state()
    for i in range(2):
        obs = obs_from_scene(scene, i / 10.0, cfg)
        sa, _ = eng_a(sa, obs)
        sb, _out, times = timed.step(sb, obs)
        assert times.detect_ms > 0 and times.fuse_ms > 0
    np.testing.assert_allclose(np.asarray(sa.log_odds),
                               np.asarray(sb.log_odds), atol=1e-5)
