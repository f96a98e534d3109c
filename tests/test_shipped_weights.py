"""Regression net for the shipped checkpoints: they must stay loadable
and functional as the code evolves (skipped when absent)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DET = os.path.join(REPO, "weights/detector.npz")
ORI = os.path.join(REPO, "weights/orientation.npz")


@pytest.mark.skipif(not os.path.exists(DET), reason="no detector ckpt")
def test_shipped_detector_detects():
    from grid_vision_tpu import pipeline
    from grid_vision_tpu.config import GridVisionConfig
    from grid_vision_tpu.models import weights
    from grid_vision_tpu.train.synth_data import render_image

    cfg = GridVisionConfig(detection_weights_file="/weights/detector.npz",
                           compute_dtype="float32")
    params = weights.load_all(cfg, base_dir=REPO)
    img, gt_boxes, gt_labels, gt_valid = render_image(
        jax.random.PRNGKey(123), 480, 640)
    det = jax.jit(lambda p, im: pipeline.detect(p, im, cfg))(params, img)
    n = int(np.asarray(det.count()))
    assert n >= int(np.asarray(gt_valid).sum()) > 0
    # at least one gt box matched at IoU > 0.5 with the right class
    gtb = np.asarray(gt_boxes) * np.asarray([640, 480, 640, 480])
    dxy = np.asarray(det.xyxy)[:n]
    dl = np.asarray(det.label)[:n]
    matched = 0
    for i in range(gtb.shape[0]):
        if not np.asarray(gt_valid)[i]:
            continue
        for j in range(n):
            x1 = max(gtb[i, 0], dxy[j, 0])
            y1 = max(gtb[i, 1], dxy[j, 1])
            x2 = min(gtb[i, 2], dxy[j, 2])
            y2 = min(gtb[i, 3], dxy[j, 3])
            inter = max(x2 - x1, 0) * max(y2 - y1, 0)
            areas = ((gtb[i, 2] - gtb[i, 0]) * (gtb[i, 3] - gtb[i, 1])
                     + (dxy[j, 2] - dxy[j, 0]) * (dxy[j, 3] - dxy[j, 1]))
            if inter / max(areas - inter, 1e-9) > 0.5 \
                    and dl[j] == int(np.asarray(gt_labels)[i]):
                matched += 1
                break
    assert matched >= 1


@pytest.mark.skipif(not os.path.exists(ORI), reason="no orientation ckpt")
def test_shipped_orientation_recovers_angle():
    from grid_vision_tpu.models import orientation_net, weights
    from grid_vision_tpu.config import GridVisionConfig
    from grid_vision_tpu.ops import multibin

    cfg = GridVisionConfig(vision_weights_file="/weights/orientation.npz",
                           compute_dtype="float32")
    params = weights.load_all(cfg, base_dir=REPO)
    ocfg = orientation_net.OrientationConfig(
        input_size=cfg.network_height, width=cfg.orientation_width,
        compute_dtype=jnp.float32)

    # render a batch of oriented crops exactly like the trainer, spread
    # over the angle range; floor at measured-minus-margin (median
    # measured 2.2 deg, docs/QUALITY.md — VERDICT r2 #8 tightening)
    size = 224
    alphas = np.linspace(-np.pi + 0.2, np.pi - 0.2, 16)
    crops = []
    for alpha in alphas:
        yy = (np.arange(size)[:, None] / size - 0.5) * 2
        xx = (np.arange(size)[None, :] / size - 0.5) * 2
        c, s = np.cos(alpha), np.sin(alpha)
        u = c * xx + s * yy
        v = -s * xx + c * yy
        inside = (np.abs(u) < 0.35) & (np.abs(v) < 0.25)
        grad = (u / 0.35 + 1) / 2
        img = np.where(inside[..., None], (0.3 + 0.7 * grad)[..., None]
                       * np.array([0.8, 0.6, 0.4]), 0.1).astype(np.float32)
        mean = img.mean((0, 1), keepdims=True)
        std = img.std((0, 1), keepdims=True)
        crops.append((img - mean) / np.maximum(std, 1e-6))

    orient, conf, dims = orientation_net.forward(
        params["orientation"], jnp.asarray(np.stack(crops)), ocfg)
    alpha_hat = np.asarray(multibin.compute_alpha(orient, conf))
    err = np.abs(np.angle(np.exp(1j * (alpha_hat - alphas))))
    med = float(np.median(err))
    assert med < np.radians(5), \
        f"median angle error {np.degrees(med):.1f} deg"