"""Pallas TPU kernel: fused detector front — resize + stem convs.

Fuses the detector's whole image front end into ONE VMEM-resident pass
per image:

    640x480 camera frame
      -> antialiased-linear resize to 416 (+ /255)       [preprocess_
         detector_image semantics, constant weight matmuls]
      -> 3x3/s2 conv (3->32)  + BN + leaky 0.1           [ConvBN_0]
      -> 3x3/s2 conv (32->64) + BN + leaky 0.1           [ConvBN_1]
      -> (104, 104, 64) stage-2 activation

Why: the round-3 device profile of the 64-rig fleet step showed this
front end as the single largest XLA cost block — ~39 us/frame split
across the resize matmuls (7.9), their layout copies (4.7+), and the
two thin-channel stem convs (13.1 + 12.9 at 5.7 / 31 TF/s — C_in=3/32
3x3 convs can't fill the 128-deep MXU contraction and XLA's chosen
layouts bounce every intermediate through HBM). Here every intermediate
stays in VMEM and the convs run as im2col matmuls:

  - The resize is 12 constant-weight matmuls (3 channels x 2 row
    phases x 2 column phases). Emitting the resized image directly in
    stride-2 PHASE planes makes every 3x3/s2 tap of conv0 a STATIC
    unit-stride slice — the phase split rides the constant weight
    matrices for free, so conv0 needs no strided shuffles at all.
  - conv0 packs PACK0=4 output pixels per MXU row with a block-diagonal
    weight matrix: K=27 / N=32 alone would waste >95% of the systolic
    array; packed, the same pass computes 4 pixels (K=108, N=128), 4x
    fewer MXU cycles. The repacks are free reshapes in the flat pixel
    axis plus one small in-VMEM relayout.
  - conv1 (K=9*32=288, N=64) runs as one plain im2col matmul; its tap
    reads are static slices of conv0's phase planes.

BN folds to a per-channel scale+shift computed host-side in f32 from
the flax params (inference semantics of nn.BatchNorm with running
stats); the matmuls accumulate f32 and round to bf16 after the leaky,
slightly TIGHTER than the XLA path's bf16 BN. Equivalence with the
XLA chain (preprocess_detector_image + ConvBN_0/1) is pinned to
tolerance by tests/test_pallas_stem.py.

Reference workload being accelerated: the ONNX yolov4 preprocessing +
first network layers (src/object_detection.cpp:6-24, 61-106).

Known limitation (same as pallas_raycast): do NOT jax.vmap this call —
batching is already the kernel grid. The fleet path calls it once with
the full rig batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .preprocess import _axis_resize_weights

PACK0 = 4  # conv0 output pixels packed per MXU row (block-diag weights)


# ---------------------------------------------------------------------------
# Host-side constant preparation
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _phase4_resize_weights(n_in: int, size: int, scale: float = 1.0):
    """STRIDE-4 phase split of the (size, n_in) resize weight matrix:
    4 matrices of (size//4 + 1, n_in), phase m carrying rows 4k+m, each
    padded to size//4+1 rows with zeros (phase 0's extra row is the
    conv SAME pad at index `size`; the others' are never read).

    Why stride 4: conv0 strides 2 over the resized grid and the PACK0
    phase grouping strides 2 again, so every tap/phase combination
    reads resized rows 4k + o (o in 0..4) — with the split folded into
    the constant weights, each becomes a STATIC UNIT-STRIDE slice of a
    phase plane. Mosaic has no stride>1 vector slices, so this is what
    makes the kernel lowerable at all (and it is free: the split just
    permutes rows of a constant matrix)."""
    w = _axis_resize_weights(n_in, size) * scale
    q1 = size // 4 + 1
    out = []
    for m in range(4):
        rows = w[m::4]
        pad = np.zeros((q1 - rows.shape[0], n_in), np.float32)
        out.append(np.concatenate([rows, pad], axis=0))
    return out


def _fold_bn(bn_params, bn_stats, xp, eps: float = 1e-5):
    """flax inference BatchNorm -> per-channel (scale, shift) in f32.
    `xp` is np (host precompute) or jnp (in-graph fallback)."""
    gamma = xp.asarray(bn_params["scale"], xp.float32)
    beta = xp.asarray(bn_params["bias"], xp.float32)
    mean = xp.asarray(bn_stats["mean"], xp.float32)
    var = xp.asarray(bn_stats["var"], xp.float32)
    scale = gamma / xp.sqrt(var + eps)
    return scale, beta - mean * scale


def _block_diag_pack(w, pack, xp):
    """(K, F) weight -> (pack*K, pack*F) block-diagonal matrix (the
    phase/pixel-group packing both fused kernels use to fill the MXU's
    128 lanes). np path writes blocks directly; the tracer path builds
    the same matrix with constant selectors (no scatter on tracers)."""
    kk, f = int(w.shape[0]), int(w.shape[1])
    if xp is np:
        blk = np.zeros((pack * kk, pack * f), np.float32)
        for g in range(pack):
            blk[g * kk:(g + 1) * kk, g * f:(g + 1) * f] = w
        return blk
    eye = np.zeros((pack, pack * kk, kk), np.float32)
    sel = np.zeros((pack, f, pack * f), np.float32)
    for g in range(pack):
        eye[g, g * kk:(g + 1) * kk] = np.eye(kk, dtype=np.float32)
        sel[g, :, g * f:(g + 1) * f] = np.eye(f, dtype=np.float32)
    return jnp.einsum("gik,kf,gfj->ij", jnp.asarray(eye), w,
                      jnp.asarray(sel))


def _full_spec(a):
    """BlockSpec for a whole (grid-invariant) VMEM operand."""
    a = jnp.asarray(a)
    return pl.BlockSpec(a.shape, lambda i, _nd=a.ndim: (0,) * _nd,
                        memory_space=pltpu.VMEM)


def _out_sds(shape, dt, like):
    """ShapeDtypeStruct carrying `like`'s vma (required for out_shape
    under jax.shard_map with check_vma — the shared-grid/city paths)."""
    vma = getattr(jax.typeof(like), "vma", None)
    if vma is not None:
        return jax.ShapeDtypeStruct(shape, dt, vma=vma)
    return jax.ShapeDtypeStruct(shape, dt)


def prepare_stem_constants(variables):
    """Fold the stem weights ONCE from concrete detector variables
    (Engine init) — the per-dispatch kernel then consumes plain device
    arrays instead of re-deriving them inside the scan body (XLA does
    not reliably hoist even loop-invariant weight math out of a
    lax.scan on this backend; see the resize-weight finding in
    ops/preprocess._axis_resize_weights).

    Conv kernel K-orders are the kernel's im2col orders:
      conv0: k = (ty*3 + tx)*3 + c, block-diagonal over PACK0 pixels
      conv1: k = (ty*3 + tx)*32 + c

    Works on tracers too (jnp fallback) for direct pipeline callers
    that bypass Engine."""
    p = variables["params"]
    s = variables["batch_stats"]
    w0 = p["ConvBN_0"]["Conv_0"]["kernel"]
    xp = jnp if isinstance(w0, jax.core.Tracer) else np
    w0 = xp.asarray(w0, xp.float32).reshape(27, 32)   # (ty,tx,c) -> k
    s0, b0 = _fold_bn(p["ConvBN_0"]["BatchNorm_0"],
                      s["ConvBN_0"]["BatchNorm_0"], xp)
    # block-diagonal pack: PACK0 pixels per MXU row
    w0blk = _block_diag_pack(w0, PACK0, xp)
    s0blk = xp.tile(s0, PACK0).reshape(1, PACK0 * 32)
    b0blk = xp.tile(b0, PACK0).reshape(1, PACK0 * 32)

    w1 = xp.asarray(p["ConvBN_1"]["Conv_0"]["kernel"],
                    xp.float32).reshape(288, 64)      # (ty,tx,c) -> k
    s1, b1 = _fold_bn(p["ConvBN_1"]["BatchNorm_0"],
                      s["ConvBN_1"]["BatchNorm_0"], xp)
    return dict(w0blk=w0blk, s0=s0blk, b0=b0blk, w1=w1,
                s1=s1.reshape(1, 64), b1=b1.reshape(1, 64))


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

def _leaky(x):
    return jnp.where(x > 0, x, 0.1 * x)


def _flat_view(ref, shape, interp: bool):
    """Read a scratch ref through a contiguous reshaped view (the
    Mosaic-supported way to flatten trailing dims); interpret mode
    lacks store/load through RefReshaper, so value reshapes (legal
    there) are used instead."""
    if interp:
        return ref[:].reshape(*shape)
    return ref.reshape(*shape)[:]


def _flat_store(ref, shape, val, interp: bool):
    """Store `val` (shaped `shape`) into a scratch ref of a different
    contiguous shape through a reshaped view (the dual of _flat_view:
    Mosaic has no minor-dim-splitting value reshape either)."""
    if interp:
        ref[:] = val.reshape(ref.shape)
    else:
        ref.reshape(*shape)[:] = val


def _stem_kernel(img_ref, wx0_ref, wx1_ref, wx2_ref, wx3_ref,
                 wy0_ref, wy1_ref, wy2_ref, wy3_ref,
                 w0_ref, s0_ref, b0_ref, w1_ref, s1_ref, b1_ref,
                 out_ref, scr0_ref, scrm_ref, scr1_ref, *, size: int,
                 dt, interp: bool):
    wx_refs = (wx0_ref, wx1_ref, wx2_ref, wx3_ref)
    wy_refs = (wy0_ref, wy1_ref, wy2_ref, wy3_ref)
    quarter = size // 4                               # 104
    img = img_ref[0]                                  # (3, H, W) dt

    # ---- resize into STRIDE-4 phase planes (constant matmuls) ---------
    # r16[mi][mj][c] (q1, q1): resized rows 4k+mi, cols 4k+mj, with the
    # conv SAME zero pad riding phase 0's extra row/col (folded into
    # the weights — see _phase4_resize_weights).
    r16 = [[[None] * 3 for _ in range(4)] for _ in range(4)]
    for c in range(3):
        t4 = [jax.lax.dot_general(                    # (H, q1)
            img[c], wx_refs[mj][:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt)
            for mj in range(4)]
        for mi in range(4):
            wyp = wy_refs[mi][:]                      # (q1, H)
            for mj in range(4):
                r16[mi][mj][c] = jax.lax.dot_general(
                    wyp, t4[mj], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(dt)

    # ---- conv0: 3x3/s2 (3->32) + BN + leaky as ONE packed matmul ------
    # Output pixel (2i2+pi, 2j2+pj) of the 208-grid taps resized rows
    # 4*i2 + (2*pi+ty), so tap x phase = STATIC slice of stride-4 phase
    # plane (2*pi+ty)%4 at offset (2*pi+ty)//4. The PACK0=4 block-
    # diagonal groups are conv0's own four stride-2 output PHASES, so
    # the unpack to conv1's tap planes is a static row slice too — the
    # whole kernel needs no strided vector ops (Mosaic has none).
    mq = quarter * quarter                            # pixels per phase
    k = 0
    for pi in range(2):
        for pj in range(2):
            for ty in range(3):
                for tx in range(3):
                    oy, my = divmod(2 * pi + ty, 4)
                    ox, mx = divmod(2 * pj + tx, 4)
                    for c in range(3):
                        scr0_ref[k] = r16[my][mx][c][oy:oy + quarter,
                                                     ox:ox + quarter]
                        k += 1
    # the im2col flatten rides a scratch-ref RESHAPE VIEW — Mosaic has
    # no minor-dim-merging value reshape, but reading the (108, Q, Q)
    # scratch back as (108, Q*Q) is a supported contiguous view
    i2c0 = _flat_view(scr0_ref, (27 * PACK0, mq), interp)  # (108, mq)
    # f32 accumulation (Mosaic requires 32-bit matmul acc) with BN +
    # leaky also in f32 (bf16 compares don't lower on this target);
    # rounded to dt only at the store — slightly TIGHTER than the XLA
    # path's bf16 BN, within the pinned tolerances
    acc0 = jax.lax.dot_general(                       # (4*32, mq) f32
        w0_ref[:], i2c0, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc0 = _leaky(acc0 * s0_ref[0][:, None] + b0_ref[0][:, None])
    # un-flatten conv0's output back to spatial phase planes through
    # the scratch view (the dual of the i2c0 flatten)
    _flat_store(scrm_ref, (PACK0 * 32, mq), acc0.astype(dt), interp)
    # phase planes of conv0's output, zero-padded to 105 for conv1's
    # SAME (0, 1) edge (208-grid row/col 208 == even-phase index 104)
    ph = [jnp.pad(scrm_ref[g * 32:(g + 1) * 32],
                  ((0, 0), (0, 1), (0, 1)))
          for g in range(PACK0)]                      # 4x (32, 105, 105)

    # ---- conv1: 3x3/s2 (32->64) + BN + leaky, one matmul --------------
    # tap (ty, tx) == phase (ty%2, tx%2) at static offset (ty//2, tx//2)
    w1 = w1_ref[:]                                    # (288, 64)
    s1 = s1_ref[0]
    b1 = b1_ref[0]
    t_idx = 0
    for ty in range(3):
        for tx in range(3):
            scr1_ref[t_idx] = ph[(ty % 2) * 2 + tx % 2][
                :, ty // 2:ty // 2 + quarter,
                tx // 2:tx // 2 + quarter]            # (32, Q, Q)
            t_idx += 1
    i2c1 = _flat_view(scr1_ref, (288, mq), interp)
    acc1 = jax.lax.dot_general(                       # (Q*Q, 64) f32
        i2c1, w1, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = _leaky(acc1 * s1[None, :] + b1[None, :]).astype(dt)
    out_ref[0] = y.reshape(quarter, quarter, 64)


def detector_stem_im2col_xla(images: jnp.ndarray, variables, size: int,
                             compute_dtype=jnp.bfloat16,
                             consts=None) -> jnp.ndarray:
    """The SAME phase-resize + packed-im2col math as the Pallas kernel,
    expressed as batched XLA ops (detector_stem_backend="im2col") —
    intermediates go through HBM, but every matmul is MXU-shaped
    (K=108/N=128 and K=288/N=64 instead of XLA's thin-channel conv
    path) and there is no Mosaic lowering risk. Kept as the measured
    alternative to the fused kernel; tests pin both to the XLA conv
    chain."""
    b, h, w, _ = images.shape
    dt = compute_dtype
    if consts is None:
        consts = prepare_stem_constants(variables)
    quarter = size // 4
    mq = quarter * quarter
    wx4 = [jnp.asarray(m, dt)
           for m in _phase4_resize_weights(w, size, scale=1.0 / 255.0)]
    wy4 = [jnp.asarray(m, dt) for m in _phase4_resize_weights(h, size)]
    img = images.astype(dt).transpose(0, 3, 1, 2)     # (B, 3, H, W)

    # stride-4 phase planes of the resized image: r16[mi][mj] (B,3,Q,Q)
    t4 = [jnp.einsum("bcyx,jx->bcyj", img, wx4[mj]) for mj in range(4)]
    r16 = [[jnp.einsum("iy,bcyj->bcij", wy4[mi], t4[mj]).astype(dt)
            for mj in range(4)] for mi in range(4)]

    rows = []
    for pi in range(2):
        for pj in range(2):
            for ty in range(3):
                for tx in range(3):
                    oy, my = divmod(2 * pi + ty, 4)
                    ox, mx = divmod(2 * pj + tx, 4)
                    for c in range(3):
                        t = r16[my][mx][:, c, oy:oy + quarter,
                                        ox:ox + quarter]
                        rows.append(t.reshape(b, 1, mq))
    i2c0 = jnp.concatenate(rows, axis=1)              # (B, 108, mq)
    acc0 = jnp.einsum("bkm,kn->bnm", i2c0,
                      jnp.asarray(consts["w0blk"], dt),
                      preferred_element_type=jnp.float32)
    s0 = jnp.asarray(consts["s0"], jnp.float32).reshape(1, -1, 1)
    b0 = jnp.asarray(consts["b0"], jnp.float32).reshape(1, -1, 1)
    mid0 = _leaky(acc0 * s0 + b0).astype(dt)          # (B, 128, mq)

    ph = [jnp.pad(mid0[:, g * 32:(g + 1) * 32]
                  .reshape(b, 32, quarter, quarter),
                  ((0, 0), (0, 0), (0, 1), (0, 1)))
          for g in range(PACK0)]
    taps1 = []
    for ty in range(3):
        for tx in range(3):
            t = ph[(ty % 2) * 2 + tx % 2][
                :, :, ty // 2:ty // 2 + quarter,
                tx // 2:tx // 2 + quarter]
            taps1.append(t.reshape(b, 32, mq))
    i2c1 = jnp.concatenate(taps1, axis=1)             # (B, 288, mq)
    acc1 = jnp.einsum("bkm,kf->bfm", i2c1,
                      jnp.asarray(consts["w1"], dt),
                      preferred_element_type=jnp.float32)
    s1 = jnp.asarray(consts["s1"], jnp.float32).reshape(1, -1, 1)
    b1 = jnp.asarray(consts["b1"], jnp.float32).reshape(1, -1, 1)
    out = _leaky(acc1 * s1 + b1).astype(dt)           # (B, 64, mq)
    return (out.reshape(b, 64, quarter, quarter)
            .transpose(0, 2, 3, 1))                   # (B, Q, Q, 64)


# ---------------------------------------------------------------------------
# Entry point
# ---------------------------------------------------------------------------

def detector_stem_pallas(images: jnp.ndarray, variables, size: int,
                         compute_dtype=jnp.bfloat16,
                         consts=None) -> jnp.ndarray:
    """(B, H, W, 3) [0,255] frames -> (B, size/4, size/4, 64) stage-2
    activations (post ConvBN_1), fused resize+stem in one kernel.

    `variables` is the detector's flax tree (params + batch_stats);
    `consts` is the prepare_stem_constants fold (precomputed at Engine
    init; derived in-graph from `variables` when absent).

    `images` may be (B, H, W, 3) or channel-first planar (B, 3, H, W).
    HWC frames pay one XLA transpose outside the kernel (fuses into the
    producer); a PLANAR pool (the fleet fast path) skips that copy —
    inside the kernel, channel planes are natural 2D tiles either way."""
    dt = compute_dtype
    if consts is None:
        consts = prepare_stem_constants(variables)
    if images.shape[-1] == 3:                         # (B, H, W, 3)
        b, h, w, _ = images.shape
        img_p = images.astype(dt).transpose(0, 3, 1, 2)
    else:                                             # (B, 3, H, W)
        b, _, h, w = images.shape
        img_p = images.astype(dt)
    wx4 = _phase4_resize_weights(w, size, scale=1.0 / 255.0)
    wy4 = _phase4_resize_weights(h, size)

    args = (tuple(jnp.asarray(m, dt) for m in wx4)
            + tuple(jnp.asarray(m, dt) for m in wy4)
            + (jnp.asarray(consts["w0blk"], dt),
               jnp.asarray(consts["s0"], jnp.float32),
               jnp.asarray(consts["b0"], jnp.float32),
               jnp.asarray(consts["w1"], dt),
               jnp.asarray(consts["s1"], jnp.float32),
               jnp.asarray(consts["b1"], jnp.float32)))
    quarter = size // 4
    interp = jax.default_backend() != "tpu"
    kernel = functools.partial(_stem_kernel, size=size, dt=dt,
                               interp=interp)
    out_sds = _out_sds((b, quarter, quarter, 64), dt, img_p)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, 3, h, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)]
                 + [_full_spec(a) for a in args],
        out_specs=pl.BlockSpec((1, quarter, quarter, 64),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_sds,
        scratch_shapes=[
            pltpu.VMEM((27 * PACK0, quarter, quarter), dt),
            pltpu.VMEM((PACK0 * 32, quarter, quarter), dt),
            pltpu.VMEM((9, 32, quarter, quarter), dt),
        ],
        compiler_params=pltpu.CompilerParams(
            # f32 (the compat-exact fleet path) doubles every scratch
            # buffer: Mosaic's stack estimate came back 46.4 MB at a
            # 28 MB limit and 57.7 MB at 52 MB (the limit feeds the
            # scheduler, so the estimate moves with it); 100 MB of the
            # v5e's 128 MB VMEM clears it with room.
            vmem_limit_bytes=(100 if dt == jnp.float32 else 28)
                             * 1024 * 1024),
        interpret=interp,
    )(img_p, *args)
