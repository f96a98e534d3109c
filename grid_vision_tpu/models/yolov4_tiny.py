"""YOLOv4-tiny (CSPOSANet backbone, 2 YOLO heads) in Flax, TPU-first.

Replaces the reference's ONNX-Runtime-executed yolov4 416 model
(src/object_detection.cpp:41-91; weights stripped from the snapshot, see
.MISSING_LARGE_BLOBS). The output contract is reproduced exactly: for a
416x416 input, ``boxes`` (2535, 4) normalized [x1, y1, x2, y2] and
``confs`` (2535, 10) = sigmoid(obj) * sigmoid(cls) — 2535 = 3 anchors x
(13^2 + 26^2), the two heads concatenated 13-grid first, anchor-major
(matching the pytorch-YOLOv4-style export the reference consumes, whose
tensors are named input/boxes/confs, src/object_detection.cpp:79-80,
105-106).

TPU-first choices: NHWC layout, bfloat16 conv compute with f32 params and
f32 decode, everything static-shaped so XLA tiles convs onto the MXU.
The upstream weights blob is unrecoverable; weights init randomly (or
load from an orbax/npz checkpoint via models.weights) — the detection
*math* (decode, thresholds, NMS) is what parity tests pin down.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# darknet yolov4-tiny anchors (pixels at 416); head masks (3,4,5)/(1,2,3).
ANCHORS = np.array([[10, 14], [23, 27], [37, 58],
                    [81, 82], [135, 169], [344, 319]], np.float32)
HEAD_MASKS = ((3, 4, 5), (1, 2, 3))
SCALE_XY = 1.05  # yolov4-tiny scale_x_y for both heads


@dataclasses.dataclass(frozen=True)
class YoloConfig:
    num_classes: int = 10
    input_size: int = 416
    compute_dtype: Any = jnp.bfloat16
    # Stem convs (3x3/stride-2) as space-to-depth + 2x2/stride-1 convs:
    # an exact weight rearrangement (same taps, same math — verified to
    # float rounding in tests/test_models.py) that deepens the MXU
    # contraction from k*k*C_in = 27 to 48 on the C_in=3 first layer.
    # HONEST NEGATIVE RESULT (round 3, tools/bench_s2d_ab.py): on the
    # v5e the rearrangement measured 5 087 vs 6 046 fused fps (-16%)
    # in an interleaved A/B at the 64-rig exact config — XLA already
    # handles the thin-C first conv well and the extra transpose +
    # doubled-C stem loses more than the lane fill gains (same story
    # as the int8 twin). Kept as an option; default OFF.
    s2d_stem: bool = False
    # The input is the POST-ConvBN_1 stage-2 activation (B, S/4, S/4,
    # 64) computed externally (the fused Pallas resize+stem kernel,
    # ops/pallas_stem.py); ConvBN_0/1 params are still materialized on
    # dummies so the tree matches the canonical form and checkpoints
    # are shared.
    stem_external: bool = False
    # The input is the POST-first-maxpool stage-3 activation (B, S/8,
    # S/8, 128): ConvBN_2 + CSPBlock_0 + max_pool also ran externally
    # (ops/pallas_csp.py); implies stem_external semantics for the
    # earlier layers. Params again materialized on dummies.
    front_external: bool = False

    @property
    def num_anchors_total(self) -> int:
        s = self.input_size
        return 3 * ((s // 32) ** 2 + (s // 16) ** 2)


def _s2d_conv(x: jnp.ndarray, w: jnp.ndarray, dtype) -> jnp.ndarray:
    """3x3/stride-2 SAME conv as space-to-depth(2) + 2x2/stride-1 conv.

    Exact tap-for-tap rearrangement: x[2p+dy, 2q+dx] lives in phase
    (dy%2, dx%2) at offset (dy//2, dx//2), so the 3x3 kernel maps onto a
    (2, 2, 4*C, F) kernel over the 4 interleaved phase images (the
    (odd, offset-1) quarter is structurally zero). SAME padding for
    even H/W and k=3/s=2 is (0, 1) per dim, which lands entirely on the
    even phases' high edge — identical zeros either way."""
    b, h, wd, c = x.shape
    f = w.shape[-1]
    w = w.astype(dtype)
    w2 = jnp.zeros((2, 2, 4 * c, f), dtype)
    for dy in range(3):
        for dx in range(3):
            ci = ((dy % 2) * 2 + dx % 2) * c
            w2 = w2.at[dy // 2, dx // 2, ci:ci + c, :].set(w[dy, dx])
    xs = x.reshape(b, h // 2, 2, wd // 2, 2, c)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, wd // 2, 4 * c)
    return jax.lax.conv_general_dilated(
        xs.astype(dtype), w2, (1, 1), ((0, 1), (0, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ConvBN(nn.Module):
    """conv 3x3/1x1 + batchnorm + leaky(0.1) — the only block darknet
    tiny uses. s2d=True (stem layers) computes the identical stride-2
    conv through _s2d_conv; the parameter stays the canonical (3,3,C,F)
    kernel either way."""
    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Any = jnp.bfloat16
    s2d: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.s2d and self.kernel == 3 and self.stride == 2 \
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            conv = nn.Conv(self.features, (3, 3), strides=(2, 2),
                           padding="SAME", use_bias=False,
                           dtype=self.dtype, param_dtype=jnp.float32,
                           name="Conv_0")
            # materialize the canonical params (the dummy call is dead
            # code XLA eliminates), then run the equivalent s2d form
            _ = conv(jnp.zeros((1, 4, 4, x.shape[-1]), x.dtype))
            w = self.get_variable("params", "Conv_0")["kernel"]
            x = _s2d_conv(x.astype(self.dtype), w, self.dtype)
        else:
            x = nn.Conv(self.features, (self.kernel, self.kernel),
                        strides=(self.stride, self.stride),
                        padding="SAME", use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32)(x)
        # BN in the compute dtype: at inference it is a per-channel
        # scale+shift that XLA fuses into the conv epilogue; an f32 BN
        # between bf16 convs forces dtype round-trips that break the
        # fusion (measured via tools/perf_ablate.py).
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        return nn.leaky_relu(x, 0.1).astype(self.dtype)


class CSPBlock(nn.Module):
    """The tiny CSP/OSA block: split -> two 3x3 convs -> partial concat ->
    1x1 transition -> full concat. Input ch, output 2*ch (pre-maxpool);
    also returns the 1x1 transition (the FPN tap)."""
    ch: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        half = self.ch // 2
        x1 = ConvBN(half, 3, dtype=self.dtype)(x[..., half:], train)
        x2 = ConvBN(half, 3, dtype=self.dtype)(x1, train)
        x3 = ConvBN(self.ch, 1, dtype=self.dtype)(
            jnp.concatenate([x2, x1], axis=-1), train)
        out = jnp.concatenate([x, x3], axis=-1)
        return out, x3


class YoloV4Tiny(nn.Module):
    """Backbone + FPN + 2 raw heads. Input NHWC float in [0, 1]."""
    cfg: YoloConfig = YoloConfig()

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.cfg.compute_dtype
        c = self.cfg.num_classes
        x = x.astype(d)
        s2d = self.cfg.s2d_stem
        if self.cfg.stem_external or self.cfg.front_external:
            # x is already the post-stem (B, S/4, S/4, 64) activation
            # (or post-CSP stage for front_external); run the bypassed
            # blocks on dummies so the param tree (and thus any
            # checkpoint) is identical to the canonical form — XLA
            # eliminates the dead compute.
            dummy = jnp.zeros((1, 8, 8, 3), x.dtype)
            dummy = ConvBN(32, 3, 2, dtype=d)(dummy, train)
            dummy = ConvBN(64, 3, 2, dtype=d)(dummy, train)
        else:
            x = ConvBN(32, 3, 2, dtype=d, s2d=s2d)(x, train)   # 208
            x = ConvBN(64, 3, 2, dtype=d, s2d=s2d)(x, train)   # 104
        if self.cfg.front_external:
            dummy = ConvBN(64, 3, dtype=d)(dummy, train)
            _ = CSPBlock(64, dtype=d)(dummy, train)
        else:
            x = ConvBN(64, 3, dtype=d)(x, train)
            x, _ = CSPBlock(64, dtype=d)(x, train)
            x = nn.max_pool(x, (2, 2), (2, 2))         # 52, 128ch
        x = ConvBN(128, 3, dtype=d)(x, train)
        x, _ = CSPBlock(128, dtype=d)(x, train)
        x = nn.max_pool(x, (2, 2), (2, 2))             # 26, 256ch
        x = ConvBN(256, 3, dtype=d)(x, train)
        x, fpn_tap = CSPBlock(256, dtype=d)(x, train)  # tap: 256ch @26
        x = nn.max_pool(x, (2, 2), (2, 2))             # 13, 512ch
        x = ConvBN(512, 3, dtype=d)(x, train)

        neck = ConvBN(256, 1, dtype=d)(x, train)
        h1 = ConvBN(512, 3, dtype=d)(neck, train)
        head1 = nn.Conv(3 * (5 + c), (1, 1), dtype=d,
                        param_dtype=jnp.float32, name="head_13")(h1)

        up = ConvBN(128, 1, dtype=d)(neck, train)
        b, hh, ww, cc = up.shape
        up = jax.image.resize(up, (b, hh * 2, ww * 2, cc), "nearest")
        h2 = jnp.concatenate([up, fpn_tap], axis=-1)
        h2 = ConvBN(256, 3, dtype=d)(h2, train)
        head2 = nn.Conv(3 * (5 + c), (1, 1), dtype=d,
                        param_dtype=jnp.float32, name="head_26")(h2)
        return head1.astype(jnp.float32), head2.astype(jnp.float32)


def decode_head(raw: jnp.ndarray, anchors: np.ndarray, input_size: int,
                num_classes: int):
    """One head (B, H, W, 3*(5+C)) -> boxes (B, 3*H*W, 4) normalized xyxy
    and confs (B, 3*H*W, C) = sigmoid(obj) * sigmoid(cls).

    Flattening is anchor-major then row-major (A, H, W) — the layout the
    reference indexes as rows of its (2535, 4)/(2535, 10) Eigen maps.
    """
    b, h, w, _ = raw.shape
    a = anchors.shape[0]
    raw = raw.reshape(b, h, w, a, 5 + num_classes)
    raw = raw.transpose(0, 3, 1, 2, 4)                  # (B, A, H, W, ...)

    grid_x = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    grid_y = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    s = SCALE_XY
    bx = (jax.nn.sigmoid(raw[..., 0]) * s - 0.5 * (s - 1.0) + grid_x) / w
    by = (jax.nn.sigmoid(raw[..., 1]) * s - 0.5 * (s - 1.0) + grid_y) / h
    an_w = jnp.asarray(anchors[:, 0])[None, :, None, None] / input_size
    an_h = jnp.asarray(anchors[:, 1])[None, :, None, None] / input_size
    bw = jnp.exp(raw[..., 2]) * an_w
    bh = jnp.exp(raw[..., 3]) * an_h
    boxes = jnp.stack([bx - bw / 2, by - bh / 2,
                       bx + bw / 2, by + bh / 2], axis=-1)
    obj = jax.nn.sigmoid(raw[..., 4])
    cls = jax.nn.sigmoid(raw[..., 5:])
    confs = obj[..., None] * cls
    n = a * h * w
    return boxes.reshape(b, n, 4), confs.reshape(b, n, num_classes)


def decode(head1: jnp.ndarray, head2: jnp.ndarray, cfg: YoloConfig):
    """Both heads -> (B, 2535, 4) boxes + (B, 2535, C) confs, 13-grid
    head first (network/export order)."""
    b1, c1 = decode_head(head1, ANCHORS[list(HEAD_MASKS[0])],
                         cfg.input_size, cfg.num_classes)
    b2, c2 = decode_head(head2, ANCHORS[list(HEAD_MASKS[1])],
                         cfg.input_size, cfg.num_classes)
    return (jnp.concatenate([b1, b2], axis=1),
            jnp.concatenate([c1, c2], axis=1))


def init_params(rng: jax.Array, cfg: YoloConfig = YoloConfig()):
    """Initialize params + batch stats on a dummy input.

    jit-wrapped: flax's eager init dispatches hundreds of individual ops,
    which is pathological on high-latency device links (this machine's
    TPU tunnel); one compiled computation keeps cold start bounded.
    """
    model = YoloV4Tiny(cfg)

    @jax.jit
    def _init(rng):
        dummy = jnp.zeros((1, cfg.input_size, cfg.input_size, 3),
                          jnp.float32)
        return model.init(rng, dummy, train=False)

    return _init(rng)


def forward(variables, images: jnp.ndarray, cfg: YoloConfig = YoloConfig()):
    """images (B, S, S, 3) in [0,1] -> (boxes (B, N, 4), confs (B, N, C))."""
    model = YoloV4Tiny(cfg)
    h1, h2 = model.apply(variables, images, train=False)
    return decode(h1, h2, cfg)
