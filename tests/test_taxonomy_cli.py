"""Direct coverage for the taxonomy mapping (component 7 parity), the
scene training dataset, and the CLI surface."""

import subprocess
import sys

import numpy as np


def test_taxonomy_matches_reference_enum():
    """The 10-class enum, names, dynamic split and per-class constants
    mirror object_detection.hpp:12-25 / .cpp:252-289,
    grid_vision_node.cpp:384-403, occupancy_grid.cpp:185-196."""
    from grid_vision_tpu import taxonomy as t

    assert [c.name for c in t.ObjectClass] == [
        "BIKE", "MOTORBIKE", "PERSON", "TRAFFIC_LIGHT_GREEN",
        "TRAFFIC_LIGHT_ORANGE", "TRAFFIC_LIGHT_RED", "TRAFFIC_SIGN_30",
        "TRAFFIC_SIGN_60", "TRAFFIC_SIGN_90", "VEHICLE", "UNKNOWN"]
    assert t.NUM_CLASSES == 10
    assert t.class_name(9) == "Vehicle"
    assert t.class_name(5) == "Light Red"
    assert t.class_name(77) == "Unknown"
    # dynamic split: vehicle/person/bike/motorbike only
    dyn = np.asarray(t.is_dynamic(np.arange(11)))
    assert dyn.tolist() == [True, True, True, False, False, False,
                            False, False, False, True, False]
    # estimated footprint depths (occupancy_grid.cpp:185-196)
    d = t.ESTIMATED_DEPTH_LUT
    assert d[int(t.ObjectClass.VEHICLE)] == np.float32(3.5)
    assert d[int(t.ObjectClass.PERSON)] == np.float32(0.6)
    assert d[int(t.ObjectClass.BIKE)] == np.float32(2.5)
    assert d[int(t.ObjectClass.TRAFFIC_SIGN_30)] == np.float32(-1.0)


def test_scene_dataset_targets_consistent():
    """Every rendered frame's positive anchors carry labels that exist
    in the scene, and positives exist for frames with visible traffic."""
    from grid_vision_tpu.config import GridVisionConfig
    from grid_vision_tpu.models.yolov4_tiny import YoloConfig
    from grid_vision_tpu.train.scene_dataset import build_scene_dataset

    imgs, tb, tc, tp = build_scene_dataset(8, GridVisionConfig(),
                                           YoloConfig(), seed=9000)
    assert imgs.dtype == np.uint8 and imgs.shape[1:] == (480, 640, 3)
    assert tp.sum() > 0, "no positive anchors in 8 frames"
    pos = tp > 0
    labels = set(np.unique(tc[pos]).tolist())
    # 10-class scene world (add_random_traffic): every label is a real
    # taxonomy id, and the random traffic spans beyond the two
    # default-traffic classes
    assert labels <= set(range(10)), labels
    assert len(labels) > 2, labels
    # positive boxes are normalized and non-degenerate
    boxes = tb[pos]
    assert (boxes[:, 2] > boxes[:, 0]).all()
    assert (boxes[:, 3] > boxes[:, 1]).all()
    assert boxes.min() >= 0.0 and boxes.max() <= 1.0


def test_cli_help_lists_all_commands():
    out = subprocess.run([sys.executable, "-m", "grid_vision_tpu"],
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0
    for cmd in ("run", "view", "serve", "record", "demo", "train",
                "eval", "eval-pose", "bench"):
        assert cmd in out.stdout, f"{cmd} missing from CLI help"


def test_cli_unknown_command_fails():
    out = subprocess.run([sys.executable, "-m", "grid_vision_tpu",
                          "frobnicate"],
                         capture_output=True, text=True, timeout=120)
    assert out.returncode != 0
