"""Losses for the two model families.

yolo_loss: dense anchor-space detection loss for YOLOv4-tiny — CIoU on
positive anchors + BCE objectness + BCE class scores (the standard
yolov4 formulation the reference's pre-trained blob was produced with).
Targets are given in decoded anchor space: (N_anchors, 4) normalized
xyxy + (N_anchors,) class id + (N_anchors,) positive mask, which keeps
the loss one fused elementwise pass (no dynamic matching inside jit; the
matcher runs in the data pipeline).

multibin_loss: the Deep3DBox training objective for the orientation net —
dimension L2 + bin-confidence CE + negative-cosine orientation loss on
the responsible bin.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models import orientation_net, yolov4_tiny


def _ciou(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Complete IoU between (..., 4) xyxy boxes."""
    px1, py1, px2, py2 = (pred[..., i] for i in range(4))
    tx1, ty1, tx2, ty2 = (target[..., i] for i in range(4))
    ix1 = jnp.maximum(px1, tx1)
    iy1 = jnp.maximum(py1, ty1)
    ix2 = jnp.minimum(px2, tx2)
    iy2 = jnp.minimum(py2, ty2)
    inter = jnp.clip(ix2 - ix1, 0) * jnp.clip(iy2 - iy1, 0)
    pa = jnp.clip(px2 - px1, 0) * jnp.clip(py2 - py1, 0)
    ta = jnp.clip(tx2 - tx1, 0) * jnp.clip(ty2 - ty1, 0)
    union = pa + ta - inter
    iou = inter / jnp.maximum(union, 1e-9)

    # enclosing box diagonal + center distance
    cx1 = jnp.minimum(px1, tx1)
    cy1 = jnp.minimum(py1, ty1)
    cx2 = jnp.maximum(px2, tx2)
    cy2 = jnp.maximum(py2, ty2)
    c2 = (cx2 - cx1) ** 2 + (cy2 - cy1) ** 2 + 1e-9
    d2 = (((px1 + px2) - (tx1 + tx2)) ** 2
          + ((py1 + py2) - (ty1 + ty2)) ** 2) / 4.0

    pw = jnp.maximum(px2 - px1, 1e-9)
    ph = jnp.maximum(py2 - py1, 1e-9)
    tw = jnp.maximum(tx2 - tx1, 1e-9)
    th = jnp.maximum(ty2 - ty1, 1e-9)
    v = (4.0 / np.pi ** 2) * (jnp.arctan(tw / th) - jnp.arctan(pw / ph)) ** 2
    alpha = v / jnp.maximum(1.0 - iou + v, 1e-9)
    return iou - d2 / c2 - jax.lax.stop_gradient(alpha) * v


def _bce(logit_free_prob: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """BCE on probabilities (decoded confs are already sigmoided)."""
    p = jnp.clip(logit_free_prob, 1e-7, 1.0 - 1e-7)
    return -(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))


def yolo_loss(variables, images, tgt_boxes, tgt_class, tgt_pos,
              cfg: yolov4_tiny.YoloConfig, train: bool = True):
    """images (B,S,S,3); tgt_boxes (B,N,4) xyxy; tgt_class (B,N) int;
    tgt_pos (B,N) float {0,1}. Returns (loss, (mutated_batch_stats, aux))."""
    model = yolov4_tiny.YoloV4Tiny(cfg)
    if train:
        (h1, h2), mutated = model.apply(
            variables, images, train=True, mutable=["batch_stats"])
    else:
        h1, h2 = model.apply(variables, images, train=False)
        mutated = {}
    boxes, confs = yolov4_tiny.decode(h1, h2, cfg)

    n_pos = jnp.maximum(jnp.sum(tgt_pos), 1.0)
    ciou = _ciou(boxes, tgt_boxes)
    # darknet's delta scale 2 - w*h: small boxes get up to 2x weight (their
    # CIoU gradients are otherwise dwarfed by large boxes at equal count)
    box_scale = 2.0 - ((tgt_boxes[..., 2] - tgt_boxes[..., 0])
                       * (tgt_boxes[..., 3] - tgt_boxes[..., 1]))
    box_loss = jnp.sum((1.0 - ciou) * box_scale * tgt_pos) / n_pos

    # objectness proxy: max class conf (the export folds obj into confs)
    obj = jnp.max(confs, axis=-1)
    obj_loss = jnp.mean(_bce(obj, tgt_pos))

    cls_onehot = jax.nn.one_hot(tgt_class, cfg.num_classes)
    cls_loss = jnp.sum(
        _bce(confs, cls_onehot) * tgt_pos[..., None]) / n_pos

    loss = box_loss + obj_loss + cls_loss
    aux = {"box_loss": box_loss, "obj_loss": obj_loss, "cls_loss": cls_loss}
    return loss, (mutated, aux)


def multibin_loss(variables, crops, tgt_dims, tgt_bin, tgt_angle_offset,
                  dim_weight=None, angle_weight=None, *,
                  cfg: orientation_net.OrientationConfig,
                  train: bool = True):
    """crops (B,224,224,3); tgt_dims (B,3) residuals; tgt_bin (B,) int;
    tgt_angle_offset (B,) residual angle within the bin.

    dim_weight / angle_weight (B,) gate which head each sample trains
    (default: both). Lets one batch mix synthetic oriented crops (angle
    signal, no metric size cue -> dim_weight 0) with metric scene crops
    (true dims residuals, degenerate yaw -> angle_weight 0)."""
    model = orientation_net.make_model(cfg)
    if train:
        (orient, conf, dims), mutated = model.apply(
            variables, crops, train=True, mutable=["batch_stats"])
    else:
        orient, conf, dims = model.apply(variables, crops, train=False)
        mutated = {}

    b = crops.shape[0]
    dw = jnp.ones(b) if dim_weight is None else dim_weight
    aw = jnp.ones(b) if angle_weight is None else angle_weight
    dim_loss = (jnp.sum(dw * jnp.sum((dims - tgt_dims) ** 2, axis=-1))
                / jnp.maximum(jnp.sum(dw), 1.0))
    conf_nll = -jax.nn.log_softmax(conf)[jnp.arange(b), tgt_bin]
    conf_loss = jnp.sum(aw * conf_nll) / jnp.maximum(jnp.sum(aw), 1.0)
    sel = orient[jnp.arange(b), tgt_bin]                      # (B, 2) cos,sin
    orient_err = 1.0 - (sel[:, 0] * jnp.cos(tgt_angle_offset)
                        + sel[:, 1] * jnp.sin(tgt_angle_offset))
    orient_loss = jnp.sum(aw * orient_err) / jnp.maximum(jnp.sum(aw), 1.0)
    loss = 4.0 * dim_loss + conf_loss + 8.0 * orient_loss
    aux = {"dim_loss": dim_loss, "conf_loss": conf_loss,
           "orient_loss": orient_loss}
    return loss, (mutated, aux)
