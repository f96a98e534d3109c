"""On-device class-agnostic greedy NMS with exact reference semantics.

Mirrors fast_non_max_suppression (src/object_detection.cpp:166-211):
  - boxes sorted by confidence descending (:173-176);
  - scanning in that order, a box that is still kept suppresses every
    LATER box with IoU > threshold (:193-207; strict >, and suppressed
    boxes do not suppress others because of the ``if(!keep[i]) continue``);
  - suppression is class-agnostic (quirk Q3);
  - IoU = inter / (area_other + area_self - inter)
    (computeIoU_Eigen, :148-164).

TPU shape: the O(N^2) IoU matrix is one broadcasted op; the greedy scan is
a lax.fori_loop over rows updating a (N,) keep vector — N is the static
candidate capacity (default 256), tiny next to the conv workload.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_iou(xyxy: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) xyxy -> (N, N) IoU with the reference's denominator.

    iou[i, j] = IoU of box i (the "self" box whose area is the scalar
    area2 in computeIoU_Eigen) against box j. Degenerate/padded boxes
    (zero area, zero intersection) yield 0/0 -> guarded to 0.
    """
    x1 = jnp.maximum(xyxy[:, None, 0], xyxy[None, :, 0])
    y1 = jnp.maximum(xyxy[:, None, 1], xyxy[None, :, 1])
    x2 = jnp.minimum(xyxy[:, None, 2], xyxy[None, :, 2])
    y2 = jnp.minimum(xyxy[:, None, 3], xyxy[None, :, 3])
    inter = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    area = (xyxy[:, 2] - xyxy[:, 0]) * (xyxy[:, 3] - xyxy[:, 1])
    denom = area[None, :] + area[:, None] - inter
    return jnp.where(denom > 0, inter / jnp.where(denom == 0, 1.0, denom), 0.0)


def greedy_nms_keep(xyxy: jnp.ndarray, confidence: jnp.ndarray,
                    valid: jnp.ndarray, iou_threshold: float,
                    labels: jnp.ndarray | None = None):
    """Run reference-exact NMS on padded candidates.

    labels=None gives the reference's class-AGNOSTIC suppression (quirk
    Q3); passing labels restricts suppression to same-class pairs (the
    conventional per-class NMS, available as an extension).

    Returns (order, keep_sorted):
      order: (N,) int32 permutation sorting by confidence descending
        (stable; invalid candidates sort last),
      keep_sorted: (N,) bool keep decisions in that sorted order.
    """
    n = xyxy.shape[0]
    # std::sort by confidence desc (:173-176). jnp.argsort is stable, so
    # confidence ties break by original index — the reference's unstable
    # sort leaves ties unspecified, so any tie order is "reference-valid".
    key = jnp.where(valid, -confidence, jnp.inf)
    order = jnp.argsort(key).astype(jnp.int32)
    boxes_s = xyxy[order]
    valid_s = valid[order]

    iou = pairwise_iou(boxes_s)
    later = jnp.triu(jnp.ones((n, n), bool), k=1)
    if labels is not None:
        labels_s = labels[order]
        later = later & (labels_s[:, None] == labels_s[None, :])

    def body(i, keep):
        row = jax.lax.dynamic_index_in_dim(iou, i, axis=0, keepdims=False)
        later_i = jax.lax.dynamic_index_in_dim(later, i, axis=0,
                                               keepdims=False)
        suppress = keep[i] & later_i & (row > iou_threshold)
        return keep & ~suppress

    keep = jax.lax.fori_loop(0, n, body, valid_s)
    return order, keep
