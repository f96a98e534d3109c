"""Extension-mode tests (compat=False): class-aware NMS, yaw-aware
rasterization, comparator edge semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from grid_vision_tpu.config import GridVisionConfig
from grid_vision_tpu.geometry import quat_from_matrix
from grid_vision_tpu.ops import rasterize
from grid_vision_tpu.ops.decode import extract_boxes
from grid_vision_tpu.ops.nms import greedy_nms_keep
from grid_vision_tpu.types import GridState, LShapePoses


def test_extensions_require_compat_off():
    with pytest.raises(ValueError, match="compat=False"):
        GridVisionConfig(class_aware_nms=True).validate()
    GridVisionConfig(compat=False, class_aware_nms=True,
                     yaw_aware_rasterization=True).validate()


def test_class_aware_nms_keeps_other_class():
    cfg = GridVisionConfig(compat=False, class_aware_nms=True)
    boxes = np.zeros((2535, 4), np.float32)
    confs = np.zeros((2535, 10), np.float32)
    boxes[0] = [0.1, 0.1, 0.4, 0.4]
    boxes[1] = [0.11, 0.11, 0.41, 0.41]   # IoU ~0.87 with box 0
    confs[0, 9] = 0.95   # VEHICLE
    confs[1, 2] = 0.90   # PERSON
    got = extract_boxes(jnp.asarray(boxes), jnp.asarray(confs), cfg)
    assert int(np.asarray(got.count())) == 2  # different class survives
    # same-class overlap is still suppressed
    confs[1] = 0.0
    confs[1, 9] = 0.90
    got2 = extract_boxes(jnp.asarray(boxes), jnp.asarray(confs), cfg)
    assert int(np.asarray(got2.count())) == 1


def test_nms_iou_exactly_threshold_not_suppressed():
    """The reference suppresses on STRICT > (object_detection.cpp:203)."""
    # two side-by-side unit boxes overlapping exactly 50%: IoU = 1/3
    xyxy = jnp.asarray([[0.0, 0.0, 1.0, 1.0], [0.5, 0.0, 1.5, 1.0],
                        [0.0, 0.0, 0.0, 0.0]])
    conf = jnp.asarray([0.9, 0.8, 0.0])
    valid = jnp.asarray([True, True, False])
    _, keep = greedy_nms_keep(xyxy, conf, valid, iou_threshold=1.0 / 3.0)
    assert bool(keep[0]) and bool(keep[1])      # == threshold: kept
    _, keep2 = greedy_nms_keep(xyxy, conf, valid,
                               iou_threshold=1.0 / 3.0 - 1e-4)
    assert bool(keep2[0]) and not bool(keep2[1])  # just below: suppressed


def test_confidence_exactly_threshold_kept():
    """extract_bboxes keeps max_conf >= threshold (>=, :125)."""
    cfg = GridVisionConfig()
    boxes = np.zeros((2535, 4), np.float32)
    confs = np.zeros((2535, 10), np.float32)
    boxes[0] = [0.2, 0.2, 0.4, 0.4]
    confs[0, 9] = cfg.confidence_threshold  # exactly 0.6
    got = extract_boxes(jnp.asarray(boxes), jnp.asarray(confs), cfg)
    assert int(np.asarray(got.count())) == 1


def make_pose(px, py, length, width, yaw, capacity=8):
    c, s = np.cos(yaw), np.sin(yaw)
    R = jnp.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]], jnp.float32)
    quat = quat_from_matrix(R)
    p = LShapePoses.empty(capacity)
    return LShapePoses(
        position=p.position.at[0].set(jnp.asarray([px, py, 0.0])),
        quat=p.quat.at[0].set(quat),
        length=p.length.at[0].set(length),
        width=p.width.at[0].set(width),
        height=p.height, label=p.label,
        valid=p.valid.at[0].set(True))


def test_yaw_aware_rasterization():
    cfg = GridVisionConfig(compat=False, yaw_aware_rasterization=True)
    state = GridState.create(cfg)
    # long thin box rotated 45 deg at (16, 0)
    poses = make_pose(16.0, 0.0, 6.0, 1.0, np.pi / 4)
    lo, occ = rasterize.lshape_update_oriented(state.log_odds, poses, cfg)
    lo = np.asarray(lo)
    hits = lo > 0

    from grid_vision_tpu.geometry import grid_index_from_position
    def idx(x, y):
        i, ok = grid_index_from_position(
            jnp.asarray([x, y]), cfg.grid_center,
            (float(cfg.grid_x), float(cfg.grid_y)), cfg.resolution)
        return (int(i[0]), int(i[1]))

    d = 6.0 / 2 / np.sqrt(2) * 0.9
    assert hits[idx(16.0, 0.0)]                   # center
    assert hits[idx(16.0 + d, 0.0 + d)]           # along the rotated axis
    assert hits[idx(16.0 - d, 0.0 - d)]
    assert not hits[idx(16.0 + d, 0.0 - d)]       # perpendicular corner:
    assert not hits[idx(16.0 - d, 0.0 + d)]       # outside rotated rect
    # Discriminating cell vs the reference's axis-aligned block
    # (px +- l/2, py +- w/2): (16+2.9, 0) is inside the AA block but has
    # rotated |v| = 2.05 > w/2, so the oriented footprint excludes it.
    lo_aa, _ = rasterize.lshape_update(state.log_odds, poses, cfg)
    aa_hits = np.asarray(lo_aa) > 0
    assert aa_hits[idx(16.0 + 2.9, 0.0)]
    assert not hits[idx(16.0 + 2.9, 0.0)]


def test_yaw_aware_zero_yaw_matches_axis_aligned():
    cfg = GridVisionConfig(compat=False, yaw_aware_rasterization=True)
    state = GridState.create(cfg)
    poses = make_pose(16.0, 2.0, 4.0, 2.0, 0.0)
    lo_o, _ = rasterize.lshape_update_oriented(state.log_odds, poses, cfg)
    lo_a, _ = rasterize.lshape_update(state.log_odds, poses, cfg)
    # same cells hit up to the inclusive-block boundary convention:
    # the oriented version uses cell-center-inside, the reference's
    # block version includes the corner cells; interiors must agree.
    o_hits = np.asarray(lo_o) > 0
    a_hits = np.asarray(lo_a) > 0
    assert (o_hits & ~a_hits).sum() == 0          # oriented subset of AA
    assert o_hits.sum() >= 0.9 * a_hits.sum()     # nearly identical