"""int8-quantized YOLOv4-tiny inference path (opt-in fast mode).

The v5e MXU runs int8 at 2x its bf16 rate (394 vs 197 T/s), and the
detector's convs are the largest single stage of the fused step. This
module folds BatchNorm into each conv, quantizes weights to symmetric
per-output-channel int8 offline, and quantizes activations dynamically
(per-sample max-abs) at run time — the standard recipe that keeps CNN
mAP within ~1 point without calibration data.

Structure mirrors models/yolov4_tiny.YoloV4Tiny layer-for-layer (same
flax auto-names consumed from the same checkpoint); the decode stays
the shared yolov4_tiny.decode, so the 2535-anchor output contract
(src/object_detection.cpp:79-106) is unchanged.

Select with GridVisionConfig(detector_precision="int8", compat=False) —
an extension-mode knob gated by validate() like the other extensions:
outputs differ from the f32/bf16
reference path at the quantization-noise level, which moves some
boxes/confidences by a few ulps-to-percent. Quality is regression-
tested (tests/test_int8_detector.py: mAP within 0.02 of the float
path on held-out scenes).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .yolov4_tiny import YoloConfig, decode

_EPS = 1e-5

# (name, kernel, stride) in flax auto-naming order; CSP blocks inline.
# Mirrors YoloV4Tiny.__call__ exactly.


def fold_bn(variables: Dict[str, Any]) -> Dict[str, Dict[str, np.ndarray]]:
    """Fold BatchNorm (inference form) into each ConvBN's conv.

    Returns {layer_path: {"w": (kh, kw, cin, cout) f32, "b": (cout,)}}
    plus the two bias-carrying head convs verbatim.
    """
    params = variables["params"]
    stats = variables["batch_stats"]

    def get(tree, path):
        node = tree
        for p in path:
            node = node[p]
        return node

    folded = {}

    def fold_convbn(path: Tuple[str, ...]):
        w = np.asarray(get(params, path + ("Conv_0", "kernel")))
        gamma = np.asarray(get(params, path + ("BatchNorm_0", "scale")))
        beta = np.asarray(get(params, path + ("BatchNorm_0", "bias")))
        mean = np.asarray(get(stats, path + ("BatchNorm_0", "mean")))
        var = np.asarray(get(stats, path + ("BatchNorm_0", "var")))
        s = gamma / np.sqrt(var + _EPS)
        folded["/".join(path)] = {"w": (w * s).astype(np.float32),
                                  "b": (beta - mean * s).astype(np.float32)}

    for i in range(10):
        fold_convbn((f"ConvBN_{i}",))
    for blk in range(3):
        for i in range(3):
            fold_convbn((f"CSPBlock_{blk}", f"ConvBN_{i}"))
    for head in ("head_13", "head_26"):
        folded[head] = {
            "w": np.asarray(params[head]["kernel"], np.float32),
            "b": np.asarray(params[head]["bias"], np.float32)}
    return folded


def quantize_detector(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Offline weight quantization: symmetric per-output-channel int8.

    Returns a params dict {layer: {"wq" int8, "sw" f32 (cout,),
    "b" f32 (cout,)}} ready for forward_int8. Heads stay float (tiny
    1x1 convs; their outputs feed exp/sigmoid where quantization noise
    hurts most)."""
    folded = fold_bn(variables)
    q = {}
    for name, wb in folded.items():
        if name.startswith("head"):
            q[name] = {"w": jnp.asarray(wb["w"]),
                       "b": jnp.asarray(wb["b"])}
            continue
        w = wb["w"]
        sw = np.max(np.abs(w), axis=(0, 1, 2)) / 127.0    # (cout,)
        sw = np.maximum(sw, 1e-12)
        wq = np.clip(np.round(w / sw), -127, 127).astype(np.int8)
        q[name] = {"wq": jnp.asarray(wq), "sw": jnp.asarray(sw),
                   "b": jnp.asarray(wb["b"])}
    return q


def _qconv(x: jnp.ndarray, layer: Dict[str, jnp.ndarray],
           stride: int) -> jnp.ndarray:
    """Dynamic-act-quantized conv + folded bias + leaky(0.1), f32 out.

    x: (B, H, W, C) float. Per-SAMPLE activation scale (max-abs over
    each image's H, W, C — symmetric; zero-point 0 keeps SAME zero
    padding exact). Per-sample rather than per-batch so the same frame
    quantizes identically through detect (B=1) and detect_batch/fleet
    (B=N) regardless of batch composition.
    """
    sx = jnp.maximum(
        jnp.max(jnp.abs(x), axis=(1, 2, 3), keepdims=True) / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, layer["wq"], window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (sx * layer["sw"]) + layer["b"]
    return jax.nn.leaky_relu(y, 0.1)


def _fconv(x: jnp.ndarray, layer: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Float 1x1 head conv + bias (no activation)."""
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), layer["w"], window_strides=(1, 1),
        padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + layer["b"]


def _csp(x: jnp.ndarray, q: Dict[str, Any], blk: int, ch: int):
    half = ch // 2
    p = f"CSPBlock_{blk}/ConvBN_"
    x1 = _qconv(x[..., half:], q[p + "0"], 1)
    x2 = _qconv(x1, q[p + "1"], 1)
    x3 = _qconv(jnp.concatenate([x2, x1], axis=-1), q[p + "2"], 1)
    return jnp.concatenate([x, x3], axis=-1), x3


def _topology(qparams: Dict[str, Any], images: jnp.ndarray,
              cfg: YoloConfig, qconv):
    """The shared layer graph. `qconv(x, site, layer, stride)` is the
    quantized-conv hook: dynamic scales (forward_int8), static
    calibrated scales (forward_int8_static), or a recording calibrator
    (calibrate_scales) — one topology, no drift between the twins."""

    def csp(x, blk, ch):
        half = ch // 2
        p = f"CSPBlock_{blk}/ConvBN_"
        x1 = qconv(x[..., half:], p + "0", qparams[p + "0"], 1)
        x2 = qconv(x1, p + "1", qparams[p + "1"], 1)
        x3 = qconv(jnp.concatenate([x2, x1], axis=-1), p + "2",
                   qparams[p + "2"], 1)
        return jnp.concatenate([x, x3], axis=-1), x3

    x = images.astype(jnp.float32)
    x = qconv(x, "ConvBN_0", qparams["ConvBN_0"], 2)   # 208
    x = qconv(x, "ConvBN_1", qparams["ConvBN_1"], 2)   # 104
    x = qconv(x, "ConvBN_2", qparams["ConvBN_2"], 1)
    x, _ = csp(x, 0, 64)
    x = _maxpool(x)                                    # 52
    x = qconv(x, "ConvBN_3", qparams["ConvBN_3"], 1)
    x, _ = csp(x, 1, 128)
    x = _maxpool(x)                                    # 26
    x = qconv(x, "ConvBN_4", qparams["ConvBN_4"], 1)
    x, fpn_tap = csp(x, 2, 256)
    x = _maxpool(x)                                    # 13
    x = qconv(x, "ConvBN_5", qparams["ConvBN_5"], 1)

    neck = qconv(x, "ConvBN_6", qparams["ConvBN_6"], 1)
    h1 = qconv(neck, "ConvBN_7", qparams["ConvBN_7"], 1)
    head1 = _fconv(h1, qparams["head_13"])

    up = qconv(neck, "ConvBN_8", qparams["ConvBN_8"], 1)
    b, hh, ww, cc = up.shape
    up = jax.image.resize(up, (b, hh * 2, ww * 2, cc), "nearest")
    h2 = jnp.concatenate([up, fpn_tap], axis=-1)
    h2 = qconv(h2, "ConvBN_9", qparams["ConvBN_9"], 1)
    head2 = _fconv(h2, qparams["head_26"])
    return decode(head1, head2, cfg)


def forward_int8(qparams: Dict[str, Any], images: jnp.ndarray,
                 cfg: YoloConfig = YoloConfig()):
    """images (B, S, S, 3) in [0,1] -> (boxes, confs), layer-for-layer
    the int8 twin of yolov4_tiny.forward (dynamic per-sample activation
    scales)."""
    return _topology(qparams, images, cfg,
                     lambda x, _site, layer, stride: _qconv(x, layer,
                                                            stride))


def forward_int8_static(qparams: Dict[str, Any],
                        act_scales: Dict[str, jnp.ndarray],
                        images: jnp.ndarray,
                        cfg: YoloConfig = YoloConfig()):
    """Static-activation-scale int8 twin: every conv quantizes its
    input with the CALIBRATED per-site scale instead of a per-sample
    max-abs reduction. This is the semantics a fused Pallas int8
    ladder implements (activations stored int8 between layers, requant
    in the conv epilogue — no data-dependent scale reductions in the
    chain), expressed in XLA so its accuracy cost is measurable on its
    own (calibrate_scales + tests/test_int8_detector.py)."""

    def qconv(x, site, layer, stride):
        sx = act_scales[site]
        xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq, layer["wq"], window_strides=(stride, stride),
            padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (sx * layer["sw"]) + layer["b"]
        return jax.nn.leaky_relu(y, 0.1)

    return _topology(qparams, images, cfg, qconv)


def calibrate_scales(qparams: Dict[str, Any], image_batches,
                     cfg: YoloConfig = YoloConfig(),
                     headroom: float = 1.0) -> Dict[str, jnp.ndarray]:
    """Per-site static activation scales: max-abs over the calibration
    set at every conv input, / 127. Run OUTSIDE jit (records through a
    python dict). headroom > 1 leaves margin for unseen inputs."""
    maxes: Dict[str, float] = {}

    def qconv(x, site, layer, stride):
        m = float(jnp.max(jnp.abs(x)))
        maxes[site] = max(maxes.get(site, 0.0), m)
        return _qconv(x, layer, stride)

    for images in image_batches:
        _topology(qparams, jnp.asarray(images), cfg, qconv)
    return {site: jnp.float32(max(m * headroom, 1e-9) / 127.0)
            for site, m in maxes.items()}


def _maxpool(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
