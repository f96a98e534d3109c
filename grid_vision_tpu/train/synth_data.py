"""On-device synthetic detection data: rendering + target assignment in
pure jnp.

The host scene generator (io/scene.py) is fine for CPU training, but on
a tunnel-attached TPU the per-step batch upload dominates. This module
renders the same kind of colored-box world directly on device and
assigns darknet-style anchor targets in jnp, so the whole training loop
(data -> forward -> backward -> update) runs inside one jit with zero
host traffic.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.yolov4_tiny import ANCHORS, HEAD_MASKS, YoloConfig
from .targets import head_offsets

# Label palette: (class id, RGB) — distinct colors per class so the
# detector can actually learn the class mapping. ALL TEN reference
# classes (include/grid_vision/object_detection.hpp:12-25): the
# reference's weights discriminate three light colors and three sign
# values, so ours must train on all of them (pairwise channel distance
# >= ~30 against every neighbor, >> the render noise sigma of 4).
CLASS_COLORS = np.array([
    [9, 220, 60, 50],     # vehicle: red-ish
    [2, 40, 200, 80],     # person: green-ish
    [0, 60, 80, 230],     # bike: blue-ish
    [1, 200, 180, 40],    # motorbike: yellow-ish
    [3, 150, 255, 20],    # green light: lime (kept far from person-green
                          #  in R: 150 vs 40)
    [4, 250, 130, 20],    # orange light: orange
    [5, 230, 40, 160],    # red light: magenta-ish
    [6, 40, 220, 220],    # sign 30: cyan-ish
    [7, 130, 60, 150],    # sign 60: purple
    [8, 240, 240, 240],   # sign 90: white
], np.int32)


def render_image(key: jax.Array, height: int, width: int,
                 max_objects: int = 4):
    """One synthetic frame: gray background + colored class rectangles.

    Returns (image (H, W, 3) f32 [0,255], boxes_norm (G, 4) xyxy in
    [0,1], labels (G,), valid (G,)).
    """
    k_n, k_c, k_xy, k_wh, k_cls, k_noise = jax.random.split(key, 6)
    g = max_objects
    n_obj = jax.random.randint(k_n, (), 1, g + 1)
    cxy = jax.random.uniform(k_xy, (g, 2), minval=0.08, maxval=0.92)
    # Size range reaches down to ~2% of the image: the replay world
    # (io/scene.py) routinely produces 10-20 px distant objects (a person
    # at 18 m is ~18 px tall), and a detector trained only on >=6% boxes
    # scores ~0 AP on them (measured, train/eval_map.py --source scene).
    wh = jnp.exp(jax.random.uniform(
        k_wh, (g, 2), minval=jnp.log(0.018), maxval=jnp.log(0.45)))
    x0 = jnp.clip(cxy[:, 0] - wh[:, 0] / 2, 0.0, 1.0)
    x1 = jnp.clip(cxy[:, 0] + wh[:, 0] / 2, 0.0, 1.0)
    y0 = jnp.clip(cxy[:, 1] - wh[:, 1] / 2, 0.0, 1.0)
    y1 = jnp.clip(cxy[:, 1] + wh[:, 1] / 2, 0.0, 1.0)
    boxes = jnp.stack([x0, y0, x1, y1], axis=-1)
    cls_row = jax.random.randint(k_cls, (g,), 0, CLASS_COLORS.shape[0])
    palette = jnp.asarray(CLASS_COLORS)
    labels = palette[cls_row, 0]
    colors = palette[cls_row, 1:].astype(jnp.float32)
    valid = jnp.arange(g) < n_obj

    yy = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0) / height
    xx = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1) / width
    img = jnp.full((height, width, 3), 96.0)
    img = img + jnp.where(yy < 0.5, 40.0, 0.0)[..., None]
    # Paint large boxes first, small last: every labeled object stays
    # visible (a small box fully overwritten by a later large one would
    # be pure label noise).
    area_order = jnp.argsort(-(x1 - x0) * (y1 - y0))

    def paint(i, img):
        j = area_order[i]
        inside = ((xx >= x0[j]) & (xx < x1[j]) & (yy >= y0[j])
                  & (yy < y1[j]) & valid[j])
        return jnp.where(inside[..., None], colors[j], img)
    img = jax.lax.fori_loop(0, g, paint, img)
    img = img + jax.random.normal(k_noise, img.shape) * 4.0
    return jnp.clip(img, 0.0, 255.0), boxes, labels, valid


def assign_targets_jnp(boxes: jnp.ndarray, labels: jnp.ndarray,
                       valid: jnp.ndarray, cfg: YoloConfig):
    """jnp port of train.targets.assign_targets for one image.

    boxes: (G, 4) normalized xyxy. Returns dense (N, 4)/(N,)/(N,)
    targets in decode row order (incl. the shared-anchor both-heads
    quirk of the tiny masks).
    """
    n = cfg.num_anchors_total
    offsets = head_offsets(cfg)
    strides = (32, 16)
    anchors = jnp.asarray(ANCHORS)

    wh = (boxes[:, 2:4] - boxes[:, 0:2]) * cfg.input_size     # (G, 2)
    inter = (jnp.minimum(wh[:, None, 0], anchors[None, :, 0])
             * jnp.minimum(wh[:, None, 1], anchors[None, :, 1]))
    union = (wh[:, 0:1] * wh[:, 1:2] + anchors[None, :, 0]
             * anchors[None, :, 1] - inter)
    # Only anchors some head owns are assignable (targets._ANCHOR_USABLE:
    # the orphaned anchor 0 would silently drop small boxes from the loss).
    from .targets import _ANCHOR_USABLE
    iou = jnp.where(jnp.asarray(_ANCHOR_USABLE)[None, :],
                    inter / jnp.maximum(union, 1e-9), -1.0)
    best = jnp.argmax(iou, axis=-1)  # (G,)

    cx = (boxes[:, 0] + boxes[:, 2]) / 2.0
    cy = (boxes[:, 1] + boxes[:, 3]) / 2.0
    ok_geom = (valid & (wh[:, 0] > 0) & (wh[:, 1] > 0)
               & (cx >= 0) & (cx < 1) & (cy >= 0) & (cy < 1))

    tgt_boxes = jnp.zeros((n, 4))
    tgt_class = jnp.zeros((n,), jnp.int32)
    tgt_pos = jnp.zeros((n,))
    for head, mask in enumerate(HEAD_MASKS):
        s = cfg.input_size // strides[head]
        mask_arr = jnp.asarray(mask)
        in_mask = jnp.any(best[:, None] == mask_arr[None, :], axis=-1)
        a = jnp.argmax(best[:, None] == mask_arr[None, :], axis=-1)
        gx = jnp.minimum((cx * s).astype(jnp.int32), s - 1)
        gy = jnp.minimum((cy * s).astype(jnp.int32), s - 1)
        row = offsets[head] + a * s * s + gy * s + gx
        use = ok_geom & in_mask
        row = jnp.where(use, row, n)  # out-of-range rows are dropped
        tgt_boxes = tgt_boxes.at[row].set(boxes, mode="drop")
        tgt_class = tgt_class.at[row].set(labels, mode="drop")
        tgt_pos = tgt_pos.at[row].set(use.astype(jnp.float32),
                                      mode="drop")
    return tgt_boxes, tgt_class, tgt_pos


def make_batch_on_device(key: jax.Array, batch: int, cfg: YoloConfig,
                         render_hw: Tuple[int, int] = (480, 640)):
    """(images_net (B, S, S, 3) in [0,1], tgt_boxes, tgt_class, tgt_pos)."""
    h, w = render_hw

    def one(k):
        img, boxes, labels, valid = render_image(k, h, w)
        net = jax.image.resize(
            img, (cfg.input_size, cfg.input_size, 3), "linear") / 255.0
        tb, tc, tp = assign_targets_jnp(boxes, labels, valid, cfg)
        return net, tb, tc, tp

    return jax.vmap(one)(jax.random.split(key, batch))
