"""Detector-head decode: anchors -> thresholded, NMS'd, pixel-space Boxes.

Mirrors extract_bboxes (src/object_detection.cpp:94-146):
  1. per-anchor argmax class + max confidence (:118-122, Eigen maxCoeff);
  2. confidence threshold ``max_conf >= conf_threshold`` (:125);
  3. fast NMS on the survivors (:142 -> nms.py);
  4. denormalize [0,1] boxes to original pixels with int truncation
     (:143 -> denormalizeAndScaleBoundingBox :226-239 — the
     resize * (orig/resize) double-scaling, quirk Q5, nets out to
     ``trunc(x * orig)``).

TPU shape: the 2535-anchor argmax loop is one reduction; thresholded
candidates are compacted to a static capacity with top-k by confidence
(the reference keeps all survivors — with threshold 0.6 real counts are
far below the 256 default capacity; if more than capacity pass the
threshold, the lowest-confidence overflow is dropped, which the
confidence-sorted NMS makes order-preserving).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import GridVisionConfig
from ..types import Boxes
from .nms import greedy_nms_keep


def denormalize_boxes(xyxy: jnp.ndarray, orig_w: int, orig_h: int,
                      resize: int) -> jnp.ndarray:
    """denormalizeAndScaleBoundingBox (object_detection.cpp:226-239).

    x *= resize * (orig_w / resize); static_cast<int> truncates toward
    zero; the result is stored back into a double — so outputs are
    integer-valued floats.
    """
    scale_x = float(orig_w) / float(resize)
    scale_y = float(orig_h) / float(resize)
    sx = float(resize) * scale_x
    sy = float(resize) * scale_y
    scaled = xyxy * jnp.asarray([sx, sy, sx, sy], xyxy.dtype)
    return jnp.trunc(scaled)


def extract_boxes(boxes_norm: jnp.ndarray, confs: jnp.ndarray,
                  cfg: GridVisionConfig, with_overflow: bool = False):
    """boxes_norm: (A, 4) normalized xyxy; confs: (A, C) class scores.

    Returns Boxes with capacity cfg.max_detections, ordered by confidence
    descending (the reference's post-NMS order), coordinates in original
    image pixels. With with_overflow=True additionally returns the int32
    count of above-threshold anchors dropped by the max_candidates
    compaction (capacity-saturation telemetry — the reference keeps ALL
    survivors, object_detection.cpp:118-139).
    """
    num_anchors = boxes_norm.shape[0]
    max_conf = jnp.max(confs, axis=-1)
    best_class = jnp.argmax(confs, axis=-1).astype(jnp.int32)
    passed = max_conf >= cfg.confidence_threshold

    # Compact to static candidate capacity: top-k by (masked) confidence.
    k = min(cfg.max_candidates, num_anchors)
    cand_conf, cand_idx = jax.lax.top_k(
        jnp.where(passed, max_conf, -jnp.inf), k)
    cand_valid = cand_conf > -jnp.inf
    cand_xyxy = boxes_norm[cand_idx]
    cand_label = best_class[cand_idx]

    order, keep = greedy_nms_keep(
        cand_xyxy, cand_conf, cand_valid, cfg.iou_threshold,
        labels=cand_label if cfg.class_aware_nms else None)
    # Compact kept boxes to the front, preserving confidence-desc order.
    # argsort of (~keep) is stable: kept rows first, original order intact.
    compact = jnp.argsort(~keep).astype(jnp.int32)
    take = compact[: cfg.max_detections]
    sel = order[take]
    out_valid = keep[take]

    xyxy = denormalize_boxes(cand_xyxy[sel], cfg.camera_image_width,
                             cfg.camera_image_height, cfg.resize)
    out = Boxes(
        xyxy=jnp.where(out_valid[:, None], xyxy, 0.0),
        confidence=jnp.where(out_valid, cand_conf[sel], 0.0),
        label=jnp.where(out_valid, cand_label[sel], 10).astype(jnp.int32),
        valid=out_valid,
    )
    if with_overflow:
        n_passed = jnp.sum(passed.astype(jnp.int32))
        overflow = jnp.maximum(0, n_passed - k)
        return out, overflow
    return out
