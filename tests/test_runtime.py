"""Runtime tests: streaming replay, temporal decay/persistence (config-4
semantics), checkpoint round-trip, viz outputs."""

import os

import jax
import numpy as np

from grid_vision_tpu.config import GridVisionConfig
from grid_vision_tpu.demo import default_extrinsics, oracle_boxes
from grid_vision_tpu.io.scene import SyntheticScene
from grid_vision_tpu.io.viz import (draw_boxes, grid_to_rgb,
                                    markers_from_output, write_ppm)
from grid_vision_tpu.pipeline import Engine
from grid_vision_tpu.runtime.stream import obs_from_scene, replay
from grid_vision_tpu.utils import checkpoint
from grid_vision_tpu.types import SaturationStats, GridState

CFG = GridVisionConfig(use_vision_orientation=False, max_points=4096,
                       compute_dtype="float32")


def test_streaming_temporal_persistence():
    """A moving object must leave a decaying trail: cells it occupied
    earlier hold lower log-odds than its current footprint."""
    import functools
    import jax.numpy as jnp
    from grid_vision_tpu import pipeline

    eng = Engine(CFG, extrinsics=default_extrinsics(), seed=0)
    scene = SyntheticScene(CFG, seed=0)
    scene.add_object([0.0, 1.1, 25.0], [0.0, 0.0, -5.0],
                     (1.8, 1.2, 4.2), 9)  # fast approach: 0.5 m per tick
    fuse = jax.jit(functools.partial(pipeline.fuse, cfg=CFG))
    state = eng.init_state()
    for i in range(10):
        t = i / 10.0
        obs = obs_from_scene(scene, t, CFG)
        boxes = oracle_boxes(scene, t, CFG)
        state, out = fuse(eng.params, state, obs, boxes, eng.extrinsics)
    lo = np.asarray(state.log_odds)
    assert lo.max() > 3.0      # current footprint saturating
    # occupied band should span several meters of trail (movement)
    occupied_rows = np.where((lo > 0).any(axis=1))[0]
    assert occupied_rows.size > 0
    span_m = (occupied_rows.max() - occupied_rows.min()) * CFG.resolution
    assert span_m > 3.0, f"trail span {span_m} m"


def test_replay_free_run_and_realtime():
    eng = Engine(CFG, extrinsics=default_extrinsics(), seed=0)
    scene = SyntheticScene(CFG, seed=1)
    scene.add_default_traffic()
    res = replay(eng, scene, n_steps=3, hz=100.0, realtime=False)
    assert res.n_steps == 3
    assert int(res.final_state.step) == 3
    assert len(res.stats) == 3


def test_checkpoint_roundtrip(tmp_path):
    state = GridState.create(CFG, seed=3)
    state = GridState(log_odds=state.log_odds + 1.5,
                      occupancy=state.occupancy, rng=state.rng,
                      step=state.step + 7)
    path = os.path.join(tmp_path, "ckpt.npz")
    checkpoint.save(path, state)
    restored = checkpoint.restore(path, GridState.create(CFG))
    np.testing.assert_array_equal(np.asarray(restored.log_odds),
                                  np.asarray(state.log_odds))
    assert int(restored.step) == 7


def test_viz_outputs(tmp_path):
    import jax.numpy as jnp
    from grid_vision_tpu.types import Boxes, LShapePoses, StepOutput

    boxes = Boxes.empty(4)
    boxes = Boxes(xyxy=boxes.xyxy.at[0].set(jnp.asarray([10., 10., 50., 40.])),
                  confidence=boxes.confidence.at[0].set(0.9),
                  label=boxes.label.at[0].set(5),
                  valid=boxes.valid.at[0].set(True))
    img = draw_boxes(np.zeros((64, 96, 3), np.float32), boxes)
    assert (img[10, 10:51] == [0, 255, 0]).all()

    poses = LShapePoses.empty(2)
    poses = LShapePoses(position=poses.position, quat=poses.quat,
                        length=poses.length.at[0].set(4.0),
                        width=poses.width.at[0].set(2.0),
                        height=poses.height, label=poses.label,
                        valid=poses.valid.at[0].set(True))
    static_pts = jnp.zeros((4, 3))
    out = StepOutput(boxes=boxes, poses=poses, static_points=static_pts,
                     static_depths=jnp.full((boxes.capacity,), 5.0),
                     static_boxes=boxes,
                     occupancy_i8=jnp.zeros((10, 10), jnp.int8),
                     saturation=SaturationStats.zeros())
    markers = markers_from_output(out)
    kinds = {m["ns"] for m in markers}
    assert "traffic_light" in kinds   # label 5 = red light
    assert "lshape_bbox" in kinds

    rgb = grid_to_rgb(np.asarray(out.occupancy_i8))
    assert rgb.shape == (10, 10, 3)
    p = os.path.join(tmp_path, "img.ppm")
    write_ppm(p, img)
    assert os.path.getsize(p) > 0
