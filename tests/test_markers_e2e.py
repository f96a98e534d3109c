"""End-to-end marker proof for the static taxonomy: a scene containing
roadside lights/signs, DETECTED by the shipped 10-class weights (not
injected), must surface as the reference's marker content — colored
spheres for lights, "SPEED LIMIT: N KMPH" text for signs
(grid_vision_node.cpp:405-523) — with sane localized positions from the
kNN-depth static branch."""

import numpy as np

from grid_vision_tpu import pipeline
from grid_vision_tpu.config import GridVisionConfig
from grid_vision_tpu.demo import default_extrinsics
from grid_vision_tpu.io.scene import SyntheticScene
from grid_vision_tpu.io.viz import markers_from_output
from grid_vision_tpu.runtime.stream import obs_from_scene

REPO = __file__.rsplit("/tests/", 1)[0]


def test_detected_statics_emit_reference_markers():
    cfg = GridVisionConfig(
        detection_weights_file="weights/detector.npz",
        vision_weights_file="weights/orientation.npz",
        confidence_threshold=0.5)
    eng = pipeline.Engine(cfg, extrinsics=default_extrinsics(), seed=0)
    scene = SyntheticScene(cfg, seed=11)
    scene.add_default_traffic()
    scene.add_default_statics()   # red light, green light, sign 60
    obs = obs_from_scene(scene, 0.5, cfg)
    state, out = eng(eng.init_state(), obs)
    markers = markers_from_output(
        __import__("jax").device_get(out))

    spheres = [m for m in markers if m["ns"] == "traffic_light"]
    texts = [m for m in markers if m["ns"] == "traffic_sign"]
    colors = {m["color"] for m in spheres}
    assert (1.0, 0.0, 0.0) in colors, f"no red light sphere: {markers}"
    assert (0.0, 1.0, 0.0) in colors, f"no green light sphere: {markers}"
    assert any(m["text"] == "SPEED LIMIT: 60 KMPH" for m in texts), \
        f"no sign-60 text marker: {texts}"
    # localized via kNN depth: positions should be in front of the rig
    # at plausible range (base frame: x forward)
    for m in spheres:
        assert 2.0 < m["position"][0] < 40.0, m
