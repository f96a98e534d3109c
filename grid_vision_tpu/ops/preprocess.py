"""Image preprocessing: detector resize + per-box crop/resize/standardize.

Replaces the reference's OpenCV host preprocessing with on-device XLA:

  - preprocess_image (src/object_detection.cpp:6-24): resize to the
    network size (INTER_LINEAR = half-pixel bilinear), /255 to [0, 1].
    The HWC->CHW split/vconcat is a layout detail of the ONNX export; we
    stay NHWC (TPU-native).
  - getNetworkBoundingBox + normalizeRGB (src/vision_orientation.cpp:
    94-166): per-box integer-clamped crop, bilinear resize to 224, then
    PER-IMAGE PER-CHANNEL standardization (x - mean) / std — quirk Q10:
    each crop is standardized by its own statistics, not ImageNet
    constants (cv::meanStdDev = population std). A zero-variance crop
    divides by ~0 in the reference; we guard with a tiny epsilon.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..types import Boxes


def preprocess_detector_image(image: jnp.ndarray, size: int) -> jnp.ndarray:
    """(H, W, 3) float RGB in [0, 255] -> (size, size, 3) in [0, 1]."""
    resized = jax.image.resize(image, (size, size, 3), method="linear")
    return resized / 255.0


def _bilinear_sample_axis(length_in, start, extent, n_out):
    """cv2-style half-pixel sample positions for one axis, clamped to the
    crop (OpenCV clamps at borders / replicates edges)."""
    i = jnp.arange(n_out, dtype=jnp.float32)
    pos = start + (i + 0.5) * (extent / n_out) - 0.5
    pos = jnp.clip(pos, start, start + extent - 1.0)
    lo = jnp.floor(pos)
    frac = pos - lo
    lo_i = jnp.clip(lo.astype(jnp.int32), 0, length_in - 1)
    hi_i = jnp.clip(lo_i + 1, 0, length_in - 1)
    return lo_i, hi_i, frac


def crop_resize_standardize(image: jnp.ndarray, boxes: Boxes,
                            out_size: int) -> jnp.ndarray:
    """(H, W, 3) image + padded Boxes -> (D, out, out, 3) standardized
    crops. Invalid boxes yield zero crops (standardization is guarded).

    Matches getNetworkBoundingBox: xmin = max(0, int(x_min)),
    xmax = min(W-1, int(x_max)), crop width = xmax - xmin (cv::Rect —
    excludes the xmax column), resize INTER_LINEAR, then per-channel
    (x - mean) / std with the crop's own statistics.
    """
    h, w, _ = image.shape

    def one_box(xyxy, valid):
        xmin = jnp.maximum(0, jnp.trunc(xyxy[0]).astype(jnp.int32))
        ymin = jnp.maximum(0, jnp.trunc(xyxy[1]).astype(jnp.int32))
        xmax = jnp.minimum(w - 1, jnp.trunc(xyxy[2]).astype(jnp.int32))
        ymax = jnp.minimum(h - 1, jnp.trunc(xyxy[3]).astype(jnp.int32))
        bw = jnp.maximum(xmax - xmin, 1).astype(jnp.float32)
        bh = jnp.maximum(ymax - ymin, 1).astype(jnp.float32)

        ylo, yhi, fy = _bilinear_sample_axis(h, ymin.astype(jnp.float32),
                                             bh, out_size)
        xlo, xhi, fx = _bilinear_sample_axis(w, xmin.astype(jnp.float32),
                                             bw, out_size)
        tl = image[ylo[:, None], xlo[None, :]]
        tr = image[ylo[:, None], xhi[None, :]]
        bl = image[yhi[:, None], xlo[None, :]]
        br = image[yhi[:, None], xhi[None, :]]
        top = tl + (tr - tl) * fx[None, :, None]
        bot = bl + (br - bl) * fx[None, :, None]
        crop = top + (bot - top) * fy[:, None, None]  # (out, out, 3)

        mean = jnp.mean(crop, axis=(0, 1), keepdims=True)
        var = jnp.mean((crop - mean) ** 2, axis=(0, 1), keepdims=True)
        std = jnp.sqrt(var)
        crop = (crop - mean) / jnp.maximum(std, 1e-6)
        return jnp.where(valid, crop, 0.0)

    return jax.vmap(one_box)(boxes.xyxy, boxes.valid)
