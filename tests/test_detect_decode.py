"""Golden tests: bbox extraction + NMS + denormalization vs the NumPy
oracle (object_detection.cpp:94-239 incl. quirks Q3/Q5)."""

import jax.numpy as jnp
import numpy as np
import pytest

from grid_vision_tpu.config import GridVisionConfig
from grid_vision_tpu.ops.decode import extract_boxes
from grid_vision_tpu.ops.nms import pairwise_iou

from .oracle.reference_oracle import compute_iou, extract_bboxes

CFG = GridVisionConfig()


def random_head_outputs(rng, num_anchors=2535, num_classes=10,
                        n_hot=40, conf_lo=0.55, conf_hi=0.99,
                        clustered=True):
    """Synthesize detector outputs: mostly low confidence, n_hot anchors
    above threshold, optionally clustered to force NMS suppression."""
    boxes = np.zeros((num_anchors, 4), np.float32)
    cxy = rng.uniform(0.05, 0.95, size=(num_anchors, 2))
    wh = rng.uniform(0.02, 0.3, size=(num_anchors, 2))
    boxes[:, 0:2] = cxy - wh / 2
    boxes[:, 2:4] = cxy + wh / 2
    confs = rng.uniform(0.0, 0.4, size=(num_anchors, num_classes)).astype(np.float32)
    hot = rng.choice(num_anchors, size=n_hot, replace=False)
    if clustered:
        # Pack hot boxes around a few cluster centers so IoU > 0.6 happens.
        centers = rng.uniform(0.2, 0.8, size=(max(1, n_hot // 6), 2))
        for i, a in enumerate(hot):
            c = centers[i % centers.shape[0]] + rng.normal(0, 0.01, 2)
            w, h = rng.uniform(0.1, 0.2, 2)
            boxes[a] = [c[0] - w / 2, c[1] - h / 2, c[0] + w / 2, c[1] + h / 2]
    cls = rng.integers(0, num_classes, size=n_hot)
    confs[hot, cls] = rng.uniform(conf_lo, conf_hi, size=n_hot)
    return boxes.astype(np.float32), confs


def assert_matches_oracle(boxes, confs):
    ref = extract_bboxes(boxes, confs, CFG.confidence_threshold,
                         CFG.iou_threshold, CFG.camera_image_width,
                         CFG.camera_image_height, CFG.resize)
    got = extract_boxes(jnp.asarray(boxes), jnp.asarray(confs), CFG)
    n = int(np.asarray(got.count()))
    assert n == len(ref), f"kept {n} vs oracle {len(ref)}"
    got_xyxy = np.asarray(got.xyxy)[:n]
    got_conf = np.asarray(got.confidence)[:n]
    got_label = np.asarray(got.label)[:n]
    for i, r in enumerate(ref):
        np.testing.assert_allclose(
            got_xyxy[i], [r["x_min"], r["y_min"], r["x_max"], r["y_max"]],
            atol=1.0)  # int truncation at float32 boundaries may differ by 1px
        np.testing.assert_allclose(got_conf[i], r["confidence"], rtol=1e-6)
        assert got_label[i] == r["label"]


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_extract_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    assert_matches_oracle(*random_head_outputs(rng))


def test_no_detections():
    rng = np.random.default_rng(7)
    boxes, confs = random_head_outputs(rng, n_hot=0)
    got = extract_boxes(jnp.asarray(boxes), jnp.asarray(confs), CFG)
    assert int(np.asarray(got.count())) == 0


def test_many_detections_overflow_capacity():
    """More threshold survivors than max_candidates: highest-confidence
    candidates must be preserved."""
    rng = np.random.default_rng(11)
    boxes, confs = random_head_outputs(rng, n_hot=300, clustered=False)
    got = extract_boxes(jnp.asarray(boxes), jnp.asarray(confs), CFG)
    ref = extract_bboxes(boxes, confs, CFG.confidence_threshold,
                         CFG.iou_threshold, CFG.camera_image_width,
                         CFG.camera_image_height, CFG.resize)
    n = int(np.asarray(got.count()))
    # Oracle keeps everything; we cap at max_detections. The kept prefix
    # (confidence-desc) must agree.
    m = min(n, len(ref), CFG.max_detections)
    got_conf = np.asarray(got.confidence)[:m]
    ref_conf = np.array([r["confidence"] for r in ref[:m]])
    np.testing.assert_allclose(got_conf, ref_conf, rtol=1e-6)


def test_class_agnostic_suppression():
    """Quirk Q3: a high-conf box suppresses an overlapping box of a
    DIFFERENT class."""
    boxes = np.zeros((2535, 4), np.float32)
    confs = np.zeros((2535, 10), np.float32)
    boxes[0] = [0.1, 0.1, 0.4, 0.4]
    boxes[1] = [0.11, 0.11, 0.41, 0.41]
    confs[0, 9] = 0.95  # VEHICLE
    confs[1, 2] = 0.90  # PERSON, IoU ~ 0.87 with box 0
    got = extract_boxes(jnp.asarray(boxes), jnp.asarray(confs), CFG)
    assert int(np.asarray(got.count())) == 1
    assert int(np.asarray(got.label)[0]) == 9


def test_pairwise_iou_matches_oracle(rng):
    n = 32
    xy = rng.uniform(0, 1, size=(n, 2)).astype(np.float32)
    wh = rng.uniform(0.05, 0.4, size=(n, 2)).astype(np.float32)
    xyxy = np.concatenate([xy, xy + wh], axis=1)
    got = np.asarray(pairwise_iou(jnp.asarray(xyxy)))
    for i in range(n):
        box = {"x_min": xyxy[i, 0], "y_min": xyxy[i, 1],
               "x_max": xyxy[i, 2], "y_max": xyxy[i, 3]}
        ref = compute_iou(box, xyxy)
        np.testing.assert_allclose(got[i], ref, rtol=1e-5, atol=1e-6)
