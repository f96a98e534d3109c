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

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..types import Boxes


@functools.lru_cache(maxsize=None)
def _axis_resize_weights(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) interpolation weights of jax.image.resize('linear')
    for one axis, recomputed in PURE NumPy (the same antialiased
    triangle-kernel formula as jax's compute_weight_mat; equality is
    pinned by tests/test_preprocess.py against jax.image.resize).

    Why precompute on the host: jax.image.resize builds these weights
    in-graph with iota/compare chains that XLA neither constant-folds
    nor hoists out of a lax.scan body; on TPU they lower to SMEM
    scalar-core fusions that serialized the fleet step at ~25 us/frame
    (round-3 device profile, tools/profile_step.py fusions 809/810/813).
    As host constants they cost nothing per step. (Pure NumPy — not the
    resize-the-identity trick — because this is called during jit
    tracing, where any jax op returns a tracer.)"""
    if n_in == n_out:
        return np.eye(n_in, dtype=np.float32)
    scale = n_out / n_in
    kernel_scale = max(1.0 / scale, 1.0)        # antialias (downscale)
    sample_f = (np.arange(n_out, dtype=np.float64) + 0.5) / scale - 0.5
    x = np.abs(sample_f[:, None]
               - np.arange(n_in, dtype=np.float64)[None, :]) / kernel_scale
    w = np.maximum(0.0, 1.0 - x)                # triangle kernel
    total = w.sum(axis=1, keepdims=True)
    w = np.where(np.abs(total) > 1000.0 * np.finfo(np.float32).eps,
                 w / np.where(total == 0.0, 1.0, total), 0.0)
    ok = (sample_f >= -0.5) & (sample_f <= n_in - 0.5)
    return (w * ok[:, None]).astype(np.float32)


def preprocess_detector_image(image: jnp.ndarray, size: int,
                              compute_dtype=jnp.float32) -> jnp.ndarray:
    """(H, W, 3) float RGB in [0, 255] -> (size, size, 3) in [0, 1].

    Two interpolation matmuls against PRECOMPUTED constant weight
    matrices (see _axis_resize_weights) — the same math jax.image.resize
    lowers to, minus the in-graph weight construction. Running them in
    the compute dtype (bf16 in fast mode) keeps them on the MXU fast
    path. Pixel values are 8-bit to begin with, so bf16's 8-bit mantissa
    loses nothing material."""
    h, w, _ = image.shape
    wy = jnp.asarray(_axis_resize_weights(h, size), compute_dtype)
    wx = jnp.asarray(_axis_resize_weights(w, size), compute_dtype)
    img = image.astype(compute_dtype)
    # Contract the longer axis (x=640 at the default camera) first:
    # stage 2 then sums over H=480 instead of W=640 (fewer FLOPs).
    tmp = jnp.einsum("jx,yxc->yjc", wx, img)
    resized = jnp.einsum("iy,yjc->ijc", wy, tmp)
    return resized / jnp.asarray(255.0, compute_dtype)


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


def _interp_weights(length_in: int, lo, hi, frac) -> jnp.ndarray:
    """(out,) index/frac triplets -> (out, length_in) bilinear weight
    matrix with (1-frac) at column lo and frac at column hi. When
    lo == hi (border clamp) the terms sum to weight 1 on that column."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (lo.shape[0], length_in), 1)
    return ((cols == lo[:, None]) * (1.0 - frac[:, None])
            + (cols == hi[:, None]) * frac[:, None]).astype(jnp.float32)



def _box_weights(xyxy, h: int, w: int, out_size: int):
    """Per-box bilinear interpolation weight matrices ((out, h), (out, w))
    for the getNetworkBoundingBox crop semantics (int-truncated, clamped
    corners; cv::Rect excludes the max column)."""
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
    return (_interp_weights(h, ylo, yhi, fy),
            _interp_weights(w, xlo, xhi, fx))


def crop_resize_standardize(image: jnp.ndarray, boxes: Boxes,
                            out_size: int,
                            compute_dtype=jnp.float32,
                            out_dtype=None) -> jnp.ndarray:
    """(H, W, 3) image + padded Boxes -> (D, out, out, 3) standardized
    crops. Invalid boxes yield zero crops (standardization is guarded).

    Matches getNetworkBoundingBox: xmin = max(0, int(x_min)),
    xmax = min(W-1, int(x_max)), crop width = xmax - xmin (cv::Rect —
    excludes the xmax column), resize INTER_LINEAR, then per-channel
    (x - mean) / std with the crop's own statistics.

    TPU note: bilinear crop-resize is computed as two interpolation-
    weight MATMULS (Wy @ image @ Wx^T) instead of 4-corner gathers —
    dynamic 2D gathers lower to scalar loops on TPU and measured ~100x
    slower than this MXU formulation (tools/perf_ablate.py, stage d).
    """
    # In reduced-precision mode the crops are rounded to compute_dtype
    # BEFORE the statistics (halves the bandwidth of the O(area) stats
    # passes; stats still accumulate in f32). f32 mode is unchanged.
    crops = crop_resize(image, boxes, out_size, compute_dtype,
                        out_dtype=compute_dtype)
    return _standardize(crops, boxes.valid, out_dtype)


def crop_resize(image: jnp.ndarray, boxes: Boxes, out_size: int,
                compute_dtype=jnp.float32, out_dtype=None) -> jnp.ndarray:
    """The interpolation-matmul crop WITHOUT standardization.

    Split out so the fleet path can crop per rig (shared-image MXU
    einsums) but standardize only the budget-compacted crops that
    actually feed the net — the per-crop mean/var reduce + normalize is
    O(area) VPU work and was the single largest item in the 128-rig
    device profile (tools/profile_step.py; standardization is per-crop
    elementwise, so compacting first is bit-identical on kept crops).

    Accepts the image as (H, W, 3) or channel-first PLANAR (3, H, W)
    (the fleet fast-path pool layout — the Pallas detector stem wants
    planar frames, and keeping the pool planar kills a per-step
    full-image transpose copy); either layout yields identical
    (D, out, out, 3) crops — only the einsum operand order differs."""
    planar = image.shape[-1] != 3
    if planar:
        _, h, w = image.shape
    else:
        h, w, _ = image.shape
    wy, wx = jax.vmap(
        lambda b: _box_weights(b, h, w, out_size))(boxes.xyxy)
    # wy (D, out, H), wx (D, out, W)
    # crop[d, i, j, c] = sum_{y, x} Wy[d, i, y] * image[y, x, c] * Wx[d, j, x]
    # MXU inputs in compute_dtype (bf16 in fast mode), f32 accumulation.
    wy = wy.astype(compute_dtype)
    wx = wx.astype(compute_dtype)
    img = image.astype(compute_dtype)
    # Contract the LONGER image axis first (x=640 at the default camera):
    # stage-2 then sums over out_size instead of W — 25% fewer FLOPs and
    # a 25% smaller intermediate than the y-first order at 480x640
    # (same math, summation reordered).
    if planar:
        tmp = jnp.einsum("djx,cyx->dcyj", wx, img,
                         preferred_element_type=jnp.float32)
        crops = jnp.einsum("diy,dcyj->dijc", wy,
                           tmp.astype(compute_dtype),
                           preferred_element_type=jnp.float32)
    else:
        tmp = jnp.einsum("djx,yxc->dyjc", wx, img,
                         preferred_element_type=jnp.float32)
        crops = jnp.einsum("diy,dyjc->dijc", wy,
                           tmp.astype(compute_dtype),
                           preferred_element_type=jnp.float32)
    return crops.astype(out_dtype) if out_dtype is not None else crops


def _standardize(crops: jnp.ndarray, valid: jnp.ndarray,
                 out_dtype=None) -> jnp.ndarray:
    """Per-crop per-channel standardization (quirk Q10); invalid -> 0.
    Statistics ACCUMULATE in f32 whatever the crop dtype; out_dtype
    (e.g. bf16) saves bandwidth when the crops feed a bf16 net.

    Reduced-precision crops take a SINGLE-PASS moment computation
    (E[x^2] - E[x]^2): the two-pass form forced XLA to materialize an
    f32 copy of every crop in the consumer's layout (192 MB/step at the
    64-rig bench shapes, ~11 us/frame in the round-3 device profile).
    Pixels are bounded by 255, so the f32 cancellation error on the
    variance is <~4e-3 against a clamp floor of 1e-12 — immaterial next
    to the bf16 rounding the crops already carry. The f32 path keeps
    the reference-exact two-pass form.

    The reduced-precision NORMALIZE runs in the crop dtype (stats stay
    f32): subtract/multiply in f32 made XLA materialize the full f32
    normalized tensor and then relayout-convert it into the net's bf16
    conv input (copy.794 in the round-3 device profile, 7.2 us/frame at
    the 64-rig shapes). mean/inv quantize to bf16 with the same ~0.4%
    relative error the crops already carry, so the net input error is
    unchanged in order; the f32 branch is untouched."""
    if crops.dtype == jnp.float32:
        x = crops
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=(1, 2), keepdims=True)
        out = (x - mean) / jnp.maximum(jnp.sqrt(var), 1e-6)
        out = jnp.where(valid[:, None, None, None], out, 0.0)
        return out.astype(out_dtype) if out_dtype is not None else out
    x = crops
    mean = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
    ex2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=(1, 2),
                   keepdims=True)
    var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
    inv = 1.0 / jnp.maximum(jnp.sqrt(var), 1e-6)
    if _NORM_IN_F32:   # A/B reference variant (tools/bench_std_ab.py)
        out = (crops.astype(jnp.float32) - mean) * inv
        out = jnp.where(valid[:, None, None, None], out, 0.0)
        return out.astype(out_dtype) if out_dtype is not None else out
    out = ((x - mean.astype(x.dtype)) * inv.astype(x.dtype))
    out = jnp.where(valid[:, None, None, None], out,
                    jnp.zeros((), x.dtype))
    return out.astype(out_dtype) if out_dtype is not None else out


# Trace-time A/B toggle for the reduced-precision normalize above: True
# restores the f32-arithmetic variant. Flipped between jit traces by
# tools/bench_std_ab.py only; not a supported configuration knob.
_NORM_IN_F32 = False
