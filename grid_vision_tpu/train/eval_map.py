"""Detection-quality evaluation: COCO-style mAP@0.5 on held-out scenes.

The reference ships pretrained YOLOv4 weights and proves quality by
watching RViz (SURVEY §4: no test suite, manual CARLA verification).
Here quality is a number: the shipped `weights/detector.npz` is scored
against ground-truth synthetic scenes the trainer never saw, through
the EXACT production decode path (preprocess -> forward -> threshold ->
fast NMS -> denormalize, pipeline.detect), so the metric covers the
whole detection stack, not just the network.

Two held-out sources:
  - "synth": the on-device rendered world (train/synth_data.render_image)
    with an evaluation-only key stream (training consumes
    PRNGKey(1000+chunk) descendants; eval uses PRNGKey(7_700_000+i)).
  - "scene": the host SyntheticScene temporal world (io/scene.py) with
    randomized traffic — the distribution the engine actually ingests in
    replay/demo, with ground truth from scene.bbox_at.

Matching follows the standard PASCAL/COCO protocol: predictions sorted
by confidence, greedy one-to-one match to same-class ground truth at
IoU >= iou_thresh, AP = area under the interpolated precision envelope
(all-point interpolation), mAP = mean over classes present in the
ground truth.

CLI: python -m grid_vision_tpu eval [--source synth|scene] [--images N]
     [--conf 0.05] [--cpu] — prints one JSON dict.
"""

from __future__ import annotations

import dataclasses
import functools
import json
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..config import GridVisionConfig
from ..taxonomy import class_name


def iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise IoU of (N, 4) x (M, 4) xyxy boxes -> (N, M)."""
    if a.size == 0 or b.size == 0:
        return np.zeros((a.shape[0], b.shape[0]), np.float64)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = np.clip(a[:, 2] - a[:, 0], 0, None) * np.clip(
        a[:, 3] - a[:, 1], 0, None)
    area_b = np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(
        b[:, 3] - b[:, 1], 0, None)
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / np.maximum(union, 1e-12)


def match_image(pred_xyxy: np.ndarray, pred_conf: np.ndarray,
                pred_label: np.ndarray, gt_xyxy: np.ndarray,
                gt_label: np.ndarray,
                iou_thresh: float = 0.5) -> np.ndarray:
    """Greedy per-image matching. Predictions MUST be passed for one
    image; returns tp flags (bool per prediction). Each ground-truth box
    matches at most one prediction (highest-confidence first, best IoU
    among unmatched same-class GT)."""
    order = np.argsort(-pred_conf, kind="stable")
    tp = np.zeros(pred_xyxy.shape[0], bool)
    if gt_xyxy.shape[0] == 0:
        return tp
    ious = iou_matrix(pred_xyxy, gt_xyxy)
    taken = np.zeros(gt_xyxy.shape[0], bool)
    for i in order:
        cand = (~taken) & (gt_label == pred_label[i]) & (
            ious[i] >= iou_thresh)
        if not cand.any():
            continue
        j = int(np.argmax(np.where(cand, ious[i], -1.0)))
        taken[j] = True
        tp[i] = True
    return tp


def average_precision(tp: np.ndarray, conf: np.ndarray,
                      n_gt: int) -> float:
    """All-point interpolated AP (COCO AP@single-IoU / PASCAL VOC 2010+).

    tp/conf: flags and confidences of every prediction of one class
    pooled over the dataset; n_gt: total ground-truth boxes of the class.
    """
    if n_gt == 0:
        return float("nan")
    if tp.size == 0:
        return 0.0
    order = np.argsort(-conf, kind="stable")
    tp_c = np.cumsum(tp[order].astype(np.float64))
    fp_c = np.cumsum((~tp[order]).astype(np.float64))
    recall = tp_c / n_gt
    precision = tp_c / np.maximum(tp_c + fp_c, 1e-12)
    # precision envelope (monotone non-increasing from the right)
    precision = np.maximum.accumulate(precision[::-1])[::-1]
    # integrate over recall steps
    r = np.concatenate([[0.0], recall])
    p = np.concatenate([[precision[0] if precision.size else 0.0],
                        precision])
    return float(np.sum((r[1:] - r[:-1]) * p[1:]))


@dataclasses.dataclass
class EvalResult:
    map50: float
    per_class_ap: Dict[str, float]
    n_images: int
    n_gt: int
    n_pred: int
    iou_thresh: float

    def to_dict(self) -> dict:
        return {
            "mAP@0.5": round(self.map50, 4),
            "per_class_ap": {k: round(v, 4)
                             for k, v in self.per_class_ap.items()},
            "n_images": self.n_images,
            "n_gt": self.n_gt,
            "n_pred": self.n_pred,
            "iou_thresh": self.iou_thresh,
        }


def score_detections(preds: List[Tuple[np.ndarray, np.ndarray, np.ndarray]],
                     gts: List[Tuple[np.ndarray, np.ndarray]],
                     iou_thresh: float = 0.5) -> EvalResult:
    """preds[i] = (xyxy (P,4), conf (P,), label (P,)) for image i,
    already filtered to valid rows; gts[i] = (xyxy (G,4), label (G,))."""
    all_tp, all_conf, all_label = [], [], []
    gt_counts: Dict[int, int] = {}
    for (pxy, pc, pl), (gxy, gl) in zip(preds, gts):
        tp = match_image(pxy, pc, pl, gxy, gl, iou_thresh)
        all_tp.append(tp)
        all_conf.append(pc)
        all_label.append(pl)
        for c in gl.tolist():
            gt_counts[int(c)] = gt_counts.get(int(c), 0) + 1
    tp = np.concatenate(all_tp) if all_tp else np.zeros(0, bool)
    conf = np.concatenate(all_conf) if all_conf else np.zeros(0)
    label = np.concatenate(all_label) if all_label else np.zeros(0, int)

    per_class = {}
    for c, n_gt in sorted(gt_counts.items()):
        sel = label == c
        per_class[class_name(c)] = average_precision(tp[sel], conf[sel],
                                                     n_gt)
    aps = [v for v in per_class.values() if not np.isnan(v)]
    return EvalResult(
        map50=float(np.mean(aps)) if aps else 0.0,
        per_class_ap=per_class,
        n_images=len(gts),
        n_gt=int(sum(gt_counts.values())),
        n_pred=int(tp.size),
        iou_thresh=iou_thresh,
    )


# ---------------------------------------------------------------------
# Held-out dataset generation + batched inference
# ---------------------------------------------------------------------

def _detect_batched(params, images, cfg: GridVisionConfig, batch: int = 16):
    """Run pipeline.detect over a list of host images, vmapped in chunks.

    Returns per-image (xyxy, conf, label) numpy arrays (valid rows only).
    """
    import jax
    import jax.numpy as jnp

    from ..pipeline import detect

    det = jax.jit(jax.vmap(functools.partial(detect, cfg=cfg),
                           in_axes=(None, 0)))
    out = []
    for i in range(0, len(images), batch):
        chunk = images[i:i + batch]
        pad = batch - len(chunk)
        arr = jnp.asarray(np.stack(chunk + [chunk[-1]] * pad))
        boxes = det(params, arr)
        xyxy = np.asarray(boxes.xyxy)
        conf = np.asarray(boxes.confidence)
        label = np.asarray(boxes.label)
        valid = np.asarray(boxes.valid)
        for b in range(len(chunk)):
            m = valid[b]
            out.append((xyxy[b][m], conf[b][m], label[b][m]))
    return out


def heldout_synth(n_images: int, cfg: GridVisionConfig,
                  seed: int = 7_700_000):
    """Held-out frames from the on-device rendered world (the training
    distribution; evaluation-only key stream)."""
    import jax

    from .synth_data import render_image

    h, w = cfg.camera_image_height, cfg.camera_image_width
    render = jax.jit(functools.partial(render_image, height=h, width=w))
    images, gts = [], []
    for i in range(n_images):
        img, boxes, labels, valid = jax.device_get(
            render(jax.random.PRNGKey(seed + i)))
        m = np.asarray(valid)
        scale = np.asarray([w, h, w, h], np.float32)
        gts.append((np.asarray(boxes)[m] * scale,
                    np.asarray(labels)[m].astype(np.int64)))
        images.append(np.asarray(img))
    return images, gts


def heldout_scene(n_images: int, cfg: GridVisionConfig, seed: int = 500):
    """Held-out frames from the host SyntheticScene world with randomized
    traffic (the engine's replay/demo distribution)."""
    from ..io.scene import SyntheticScene

    images, gts = [], []
    rng = np.random.default_rng(seed)
    for i in range(n_images):
        scene = SyntheticScene(cfg, seed=seed + i)
        scene.add_default_traffic()
        # Held-out worlds span ALL TEN classes (lights in three colors,
        # signs in three values) so per-class AP is measured for each.
        scene.add_random_traffic(rng,
                                 n_dynamic=int(rng.integers(0, 4)),
                                 n_static=int(rng.integers(1, 4)))
        t = float(rng.uniform(0.0, 2.0))
        images.append(np.asarray(scene.image_at(t), np.float32))
        gxy, gl = [], []
        w, h = cfg.camera_image_width, cfg.camera_image_height
        for j in range(len(scene.objects)):
            bb = scene.bbox_at(j, t)
            if bb is None:
                continue
            x0 = max(0.0, bb["x_min"]); y0 = max(0.0, bb["y_min"])
            x1 = min(float(w), bb["x_max"]); y1 = min(float(h), bb["y_max"])
            if x1 - x0 < 2.0 or y1 - y0 < 2.0:
                continue
            gxy.append([x0, y0, x1, y1])
            gl.append(bb["label"])
        gts.append((np.asarray(gxy, np.float32).reshape(-1, 4),
                    np.asarray(gl, np.int64)))
    return images, gts


def evaluate_detector(params, cfg: GridVisionConfig, n_images: int = 64,
                      source: str = "synth", iou_thresh: float = 0.5,
                      eval_conf: float = 0.05,
                      seed: Optional[int] = None) -> EvalResult:
    """End-to-end mAP@iou of `params` through the production decode path.

    eval_conf replaces cfg.confidence_threshold so the PR curve has
    support below the deployment threshold (standard mAP practice; the
    deployment threshold 0.6 is a point ON this curve)."""
    ecfg = dataclasses.replace(cfg, confidence_threshold=eval_conf)
    if source == "synth":
        images, gts = heldout_synth(
            n_images, ecfg, seed=7_700_000 if seed is None else seed)
    elif source == "scene":
        images, gts = heldout_scene(
            n_images, ecfg, seed=500 if seed is None else seed)
    else:
        raise ValueError(f"unknown source {source!r}")
    preds = _detect_batched(params, images, ecfg)
    return score_detections(preds, gts, iou_thresh)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--source", choices=("synth", "scene"),
                    default="synth")
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--iou", type=float, default=0.5)
    ap.add_argument("--conf", type=float, default=0.05)
    ap.add_argument("--weights", default="weights/detector.npz")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from ..models import weights as weights_mod

    cfg = GridVisionConfig(detection_weights_file=args.weights)
    params = weights_mod.load_all(cfg, seed=0)
    res = evaluate_detector(params, cfg, n_images=args.images,
                            source=args.source, iou_thresh=args.iou,
                            eval_conf=args.conf)
    print(json.dumps(res.to_dict(), indent=1))


if __name__ == "__main__":
    main()
