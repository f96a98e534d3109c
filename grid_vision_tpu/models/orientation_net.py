"""MultiBin 3D-box regression network (the VisionOrientation model).

The reference executes a prebuilt TensorRT engine whose architecture is
unrecoverable — only its I/O contract survives
(src/vision_orientation.cpp:192-239): input [N, 3, 224, 224] float
(per-image per-channel standardized crops), outputs ``orientation``
[N, 2, 2] (cos/sin per angle bin), ``confidence`` [N, 2], ``dimension``
[N, 3] (residuals vs per-class averages). This module defines a
Deep3DBox-style network honoring that contract: a compact ResNet-18
backbone + three heads, with the orientation head L2-normalized per bin
(so atan2(sin, cos) in the post-processing is well-posed, matching the
published MultiBin formulation the engine implements).

TPU-first: NHWC, bfloat16 conv compute, f32 heads. Batch capacity is the
reference's max_batch_size_ = 8 (vision_orientation.hpp:53) but any
static batch works.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class OrientationConfig:
    bins: int = 2
    input_size: int = 224
    compute_dtype: Any = jnp.bfloat16
    width: int = 64  # stem width; stages are width * (1, 2, 4, 8)
    # "s2d": space-to-depth stem + MXU-aligned conv ladder (default —
    #   ~3x fewer FLOPs than the resnet at far better MXU utilization;
    #   see docs/PERF.md round-2 table). "resnet": the round-1 ResNet-18
    #   variant, kept for checkpoints trained against it.
    arch: str = "s2d"
    # Execute the s2d stem as ONE equivalent (3b x 3b / stride 2b) conv
    # on the raw crops (space_to_depth followed by a conv IS a single
    # big-kernel strided conv with rearranged weights — exact, same
    # parameters): skips the explicit s2d transpose, which the round-3
    # device profile showed as ~8 us/frame of pure relayout copies at
    # the 64-rig fleet shapes. Checkpoint-compatible either way.
    s2d_fold: bool = False
    # Input is the POST-ConvBN_0 activation (N, S/8, S/8, 4*width) —
    # the fused Pallas crop+standardize+stem kernel's output
    # (ops/pallas_orient.py). The bypassed ConvBN_0 still runs on a
    # dummy so the param tree matches the canonical form (the
    # yolov4_tiny.stem_external trick); s2d arch only.
    stem_external: bool = False


class ResBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y).astype(self.dtype)
        y = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1),
                               (self.stride, self.stride), use_bias=False,
                               dtype=self.dtype,
                               param_dtype=jnp.float32)(residual)
            residual = nn.BatchNorm(use_running_average=not train,
                                    dtype=self.dtype)(residual)
        return nn.relu(y + residual).astype(self.dtype)


class MultiBinHeads(nn.Module):
    """The three Deep3DBox heads: orientation (bins, 2) L2-normalized,
    bin confidence (bins,), dimension residuals (3,)."""
    bins: int = 2

    @nn.compact
    def __call__(self, x):
        orient = nn.Dense(256, name="orient_fc1")(x)
        orient = nn.relu(orient)
        orient = nn.Dense(self.bins * 2, name="orient_fc2")(orient)
        orient = orient.reshape(x.shape[0], self.bins, 2)
        norm = jnp.linalg.norm(orient, axis=-1, keepdims=True)
        orient = orient / jnp.maximum(norm, 1e-8)

        conf = nn.Dense(256, name="conf_fc1")(x)
        conf = nn.relu(conf)
        conf = nn.Dense(self.bins, name="conf_fc2")(conf)

        dims = nn.Dense(512, name="dim_fc1")(x)
        dims = nn.relu(dims)
        dims = nn.Dense(3, name="dim_fc2")(dims)
        return orient, conf, dims


class OrientationNet(nn.Module):
    cfg: OrientationConfig = OrientationConfig()

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        d = c.compute_dtype
        x = x.astype(d)
        x = nn.Conv(c.width, (7, 7), (2, 2), padding="SAME", use_bias=False,
                    dtype=d, param_dtype=jnp.float32)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=d)(x)
        x = nn.relu(x).astype(d)
        x = nn.max_pool(x, (3, 3), (2, 2), padding="SAME")
        for i, mult in enumerate((1, 2, 4, 8)):
            stride = 1 if i == 0 else 2
            x = ResBlock(c.width * mult, stride, dtype=d)(x, train)
            x = ResBlock(c.width * mult, 1, dtype=d)(x, train)
        x = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # global avg pool
        return MultiBinHeads(c.bins)(x)


def space_to_depth(x: jnp.ndarray, block: int) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H/b, W/b, C*b*b) lossless repack."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // block, block, w // block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // block, w // block, c * block * block)


class OrientationNetS2D(nn.Module):
    """TPU-first MultiBin regressor: space-to-depth(4) stem + a short
    stride-2 conv ladder with MXU-aligned channel counts.

    Rationale: the reference's TRT engine internals are unknown — only
    the I/O contract constrains the architecture — so the net is free to
    be hardware-shaped. A 7x7/s2 stem on 3 channels plus 56x56 stages at
    32 channels (the round-1 ResNet) runs the 128x128 systolic array at
    <25% lane occupancy; repacking 4x4 pixel blocks into 48 channels and
    jumping straight to 128/256 channels keeps every matmul MXU-shaped.
    ~160M MACs/crop vs ~520M for the resnet variant at equal contract.
    """
    cfg: OrientationConfig = OrientationConfig()

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        d = c.compute_dtype
        w = c.width
        stage_ch = (4 * w, 8 * w, 8 * w, 8 * w, 8 * w)
        if c.stem_external:
            # x is already ConvBN_0's output; run the bypassed block on
            # a dummy so the param tree (and any checkpoint) is
            # identical to the canonical form — XLA eliminates the
            # dead compute (see yolov4_tiny.YoloV4Tiny stem_external).
            dummy = jnp.zeros((1, 8, 8, 3), d)
            _ = ConvBN(stage_ch[0], stride=2, dtype=d,
                       s2d_fold=4)(dummy, train)
            x = x.astype(d)
            i = 1
        elif c.s2d_fold:
            # s2d(4) + 3x3/s2 conv == one 12x12/s8 conv with rearranged
            # weights (exact; tests/test_models.py pins equivalence).
            # Parameter layout stays the canonical post-s2d (3,3,48,F)
            # kernel, so checkpoints are shared with the transpose path.
            x = ConvBN(stage_ch[0], stride=2, dtype=d,
                       s2d_fold=4)(x.astype(d), train)
            i = 1
        else:
            x = space_to_depth(x.astype(d), 4)  # (N, in/4, in/4, 48)
            i = 0
        while x.shape[1] > 7:                   # stride-2 ladder down to 7
            x = ConvBN(stage_ch[min(i, len(stage_ch) - 1)], stride=2,
                       dtype=d)(x, train)
            i += 1
        x = ConvBN(8 * w, stride=1, dtype=d)(x, train)
        x = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        return MultiBinHeads(c.bins)(x)


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Any = jnp.bfloat16
    # s2d_fold=b (>0): input is the RAW (N, H, W, C) image; the stored
    # (k, k, C*b*b, F) parameter runs as the exact equivalent
    # (k*b, k*b, C, F) conv at stride*b — space_to_depth(b) followed by
    # a conv IS that single big-kernel conv with rearranged weights.
    s2d_fold: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.s2d_fold:
            b = self.s2d_fold
            k, cin = self.kernel, x.shape[-1]
            conv = nn.Conv(self.features, (k, k),
                           strides=(self.stride, self.stride),
                           padding="SAME", use_bias=False,
                           dtype=self.dtype, param_dtype=jnp.float32,
                           name="Conv_0")
            # materialize the canonical post-s2d params (the dummy call
            # is dead code XLA eliminates), then run the folded form
            _ = conv(jnp.zeros((1, 2 * k, 2 * k, cin * b * b), x.dtype))
            w3 = self.get_variable("params", "Conv_0")["kernel"]
            # channel index of the s2d input is (py*b + px)*C + c
            f = w3.shape[-1]
            wbig = (w3.reshape(k, k, b, b, cin, f)
                    .transpose(0, 2, 1, 3, 4, 5)
                    .reshape(k * b, k * b, cin, f)).astype(self.dtype)
            # SAME padding computed on the BLOCK grid, scaled to pixels
            # (zero-pad blocks == zero-pad pixels)
            nb = x.shape[1] // b
            pad_total = max((-(-nb // self.stride) - 1) * self.stride
                            + k - nb, 0)
            pl, ph = pad_total // 2, pad_total - pad_total // 2
            x = jax.lax.conv_general_dilated(
                x.astype(self.dtype), wbig,
                (self.stride * b, self.stride * b),
                ((pl * b, ph * b), (pl * b, ph * b)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
            x = nn.Conv(self.features, (self.kernel, self.kernel),
                        strides=(self.stride, self.stride), padding="SAME",
                        use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        return nn.relu(x).astype(self.dtype)


def make_model(cfg: OrientationConfig) -> nn.Module:
    if cfg.arch == "s2d":
        return OrientationNetS2D(cfg)
    if cfg.arch == "resnet":
        return OrientationNet(cfg)
    raise ValueError(f"unknown orientation arch {cfg.arch!r}")


def init_params(rng: jax.Array, cfg: OrientationConfig = OrientationConfig()):
    """jit-wrapped init (one compiled computation instead of hundreds of
    eager dispatches — see yolov4_tiny.init_params)."""
    model = make_model(cfg)

    @jax.jit
    def _init(rng):
        if cfg.stem_external:
            dummy = jnp.zeros((1, cfg.input_size // 8,
                               cfg.input_size // 8, 4 * cfg.width),
                              jnp.float32)
        else:
            dummy = jnp.zeros((1, cfg.input_size, cfg.input_size, 3),
                              jnp.float32)
        return model.init(rng, dummy, train=False)

    return _init(rng)


def forward(variables, crops: jnp.ndarray,
            cfg: OrientationConfig = OrientationConfig()):
    """crops (N, 224, 224, 3) standardized -> (orient (N, 2, 2),
    conf (N, 2), dims (N, 3))."""
    model = make_model(cfg)
    return model.apply(variables, crops, train=False)
