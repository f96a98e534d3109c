"""Pallas TPU kernel: fused orientation front — crop + standardize + stem.

Fuses the VisionOrientation branch's whole per-crop front end into ONE
VMEM-resident pass per compacted crop:

    480x640 camera frame (the crop's rig, via scalar-prefetch index)
      -> per-box bilinear crop-resize to SxS       [crop_resize
         semantics: getNetworkBoundingBox + INTER_LINEAR,
         src/vision_orientation.cpp:94-144]
      -> per-crop per-channel standardization      [normalizeRGB quirk
         Q10, src/vision_orientation.cpp:146-166 — folded AFFINELY into
         the conv, see below]
      -> 12x12/s8 folded s2d stem conv + BN + relu [ConvBN_0 of
         OrientationNetS2D with s2d_fold=4]
      -> (S/8, S/8, 4*width) stage-1 activation

Why: the round-3/4 device profiles put the orientation branch (crops +
net) at ~half the fleet-step time; the detector front end won +8.6%
from exactly this shape of fusion (ops/pallas_stem.py). The blockers
and their mechanisms here:

  - The crop-resize weights are PER-BOX (data-dependent), unlike the
    detector's constant resize matrices. The kernel builds them in-VMEM
    from precomputed per-axis (lo, hi, frac) sample vectors with
    broadcasted-iota equality masks — the same (cols==lo)*(1-f) +
    (cols==hi)*f construction as preprocess._interp_weights, so the
    crop math is identical.
  - The folded stem conv strides 8, and Mosaic has no strided vector
    slices. The per-axis sample vectors are passed PHASE-PERMUTED
    (row m*Q+k of the weight matrix is output pixel 8k+m), so the two
    resize matmuls directly emit a PHASE-BLOCKED crop in which every
    conv tap (u_y, u_x) is a STATIC unit-stride slice of phase plane
    (u_y%8, u_x%8) at offset (u_y//8, u_x//8) in {0,1} — the
    pallas_stem trick, with runtime weights.
  - Standardization runs elementwise on the VMEM-resident phase
    planes (center-then-scale, the same order as the chain — scaling
    BEFORE subtracting and folding the mean into the conv affinely
    was tried first and cancels catastrophically on near-zero-variance
    crops where inv ~ 1e6). mean/inv use the same single-pass f32
    moments as the bf16 branch of preprocess._standardize.
  - Crops are computed ONLY for the budget-compacted boxes (the XLA
    path crops all max_orientation_batch slots per rig and compacts
    after); sorting the kept indices by rig makes consecutive grid
    steps hit the same image block so Pallas elides the repeated DMA.

BN folds to scale+shift in f32 (inference semantics), relu in f32
(bf16 compares don't lower on this target), rounded to the compute
dtype at the store. Equivalence with the XLA chain (crop_resize ->
_standardize -> ConvBN_0) is pinned by tests/test_pallas_orient.py.

Reference workload being accelerated: getNetworkBoundingBox +
normalizeRGB + the TRT engine's front layers
(src/vision_orientation.cpp:94-166, 192-239).

Known limitation (same as pallas_stem): do NOT jax.vmap this call —
batching is already the kernel grid. fleet_step calls it once with the
compacted crop batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .preprocess import _bilinear_sample_axis
from .pallas_stem import _fold_bn, _out_sds

S2D_BLOCK = 4   # the model's s2d_fold block (orientation_net.ConvBN)
KSIZE = 3       # post-s2d kernel -> 12x12/s8 folded conv
PIX_K = KSIZE * S2D_BLOCK        # 12
PIX_STRIDE = 2 * S2D_BLOCK       # 8


# ---------------------------------------------------------------------------
# Host-side constant preparation
# ---------------------------------------------------------------------------

def prepare_orient_constants(variables, size: int, width: int):
    """Fold ConvBN_0's weights ONCE from concrete orientation variables
    (Engine init) into the kernel's consumables:

      wmat (432, F):  the 12x12x3 folded conv kernel in im2col K-order
                      k = (u_y*12 + u_x)*3 + c
      s, t (1, F):    BN inference scale/shift (f32)

    Works on tracers too (jnp fallback) for direct callers that bypass
    Engine, but XLA does not hoist this out of scan bodies — precompute
    (see pallas_stem.prepare_stem_constants)."""
    if size % PIX_STRIDE:
        raise ValueError(f"orientation input size {size} not a multiple "
                         f"of {PIX_STRIDE}")
    p = variables["params"]["ConvBN_0"]
    st = variables["batch_stats"]["ConvBN_0"]
    w3 = p["Conv_0"]["kernel"]                       # (3, 3, 48, F)
    xp = jnp if isinstance(w3, jax.core.Tracer) else np
    w3 = xp.asarray(w3, xp.float32)
    f = w3.shape[-1]
    assert f == 4 * width, (f, width)
    b = S2D_BLOCK
    # s2d channel index is (py*b + px)*C + c -> big-kernel pixel taps
    # (same rearrangement as orientation_net.ConvBN s2d_fold)
    wbig = (w3.reshape(KSIZE, KSIZE, b, b, 3, f)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(PIX_K, PIX_K, 3, f))
    wmat = wbig.reshape(PIX_K * PIX_K * 3, f)        # k = (uy*12+ux)*3+c
    s, t = _fold_bn(p["BatchNorm_0"], st["BatchNorm_0"], xp)
    return dict(wmat=wmat, s=s.reshape(1, f), t=t.reshape(1, f))


def _phase_perm(a: jnp.ndarray, q: int) -> jnp.ndarray:
    """(size,) output-axis vector -> phase-permuted order where row
    m*q + k carries output pixel 8k + m (free on these tiny arrays;
    it is what makes every conv tap a static slice in-kernel)."""
    return a.reshape(q, PIX_STRIDE).T.reshape(-1)


def box_axis_samples(xyxy: jnp.ndarray, h: int, w: int, size: int):
    """Per-box bilinear sample triplets for both axes, PHASE-PERMUTED:
    (ylo, yhi, yfrac, xlo, xhi, xfrac), lo/hi int32 (size,), frac f32.
    Exactly preprocess._box_weights' sampling (getNetworkBoundingBox
    int-truncated clamped corners, cv::Rect max-exclusive, INTER_LINEAR
    half-pixel positions with border clamp)."""
    q = size // PIX_STRIDE
    xmin = jnp.maximum(0, jnp.trunc(xyxy[0]).astype(jnp.int32))
    ymin = jnp.maximum(0, jnp.trunc(xyxy[1]).astype(jnp.int32))
    xmax = jnp.minimum(w - 1, jnp.trunc(xyxy[2]).astype(jnp.int32))
    ymax = jnp.minimum(h - 1, jnp.trunc(xyxy[3]).astype(jnp.int32))
    bw = jnp.maximum(xmax - xmin, 1).astype(jnp.float32)
    bh = jnp.maximum(ymax - ymin, 1).astype(jnp.float32)
    ylo, yhi, yfr = _bilinear_sample_axis(h, ymin.astype(jnp.float32),
                                          bh, size)
    xlo, xhi, xfr = _bilinear_sample_axis(w, xmin.astype(jnp.float32),
                                          bw, size)
    return tuple(_phase_perm(a, q) for a in (ylo, yhi, yfr,
                                             xlo, xhi, xfr))


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

def _orient_kernel(rig_ref, valid_ref,            # scalar prefetch
                   img_ref, ylo_ref, yhi_ref, yfr_ref,
                   xlo_ref, xhi_ref, xfr_ref,
                   wmat_ref, s_ref, t_ref,
                   out_ref, scr_pl_ref, scr_i2c_ref,
                   *, size: int, h: int, w: int, dt, interp: bool,
                   debug_stage: str | None = None):
    q = size // PIX_STRIDE
    qq = q * q
    fch = wmat_ref.shape[1]
    img = img_ref[0]                               # (3, H, W) dt

    # ---- per-box resize weights (phase-permuted row order) ------------
    # W^T[src, out] = (src==lo[out])*(1-frac[out]) + (src==hi[out])*frac
    # — preprocess._interp_weights transposed, built from iota equality
    # masks (int32 compares; bf16/f32 selects) so the weights are
    # IDENTICAL to the XLA chain's.
    def build_wt(lo_ref, hi_ref, fr_ref, length):
        src = jax.lax.broadcasted_iota(jnp.int32, (length, size), 0)
        lo = lo_ref[0]                             # (1, size) int32
        hi = hi_ref[0]
        fr = fr_ref[0]                             # (1, size) f32
        wt = (jnp.where(src == lo, 1.0 - fr, 0.0)
              + jnp.where(src == hi, fr, 0.0))
        return wt.astype(dt)                       # (length, size)

    wxt = build_wt(xlo_ref, xhi_ref, xfr_ref, w)   # (W, size)
    wyt = build_wt(ylo_ref, yhi_ref, yfr_ref, h)   # (H, size)

    # ---- crop-resize into a PHASE-BLOCKED (size, size) tile -----------
    # block (mi, mj) of QxQ carries crop pixel (8k+mi, 8l+mj): the
    # permutation rides the weight row order for free. Matmuls are
    # MXU-shaped (K = W/H, N = size); f32 accumulation, cast between
    # stages exactly like preprocess.crop_resize.
    crop = [None] * 3
    s1 = [None] * 3
    s2 = [None] * 3
    for c in range(3):
        tmp = jax.lax.dot_general(                 # (H, size)
            img[c], wxt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt)
        cc = jax.lax.dot_general(                  # (size, size) f32
            wyt, tmp, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt)
        crop[c] = cc
        cf = cc.astype(jnp.float32)
        s1[c] = jnp.sum(cf)
        s2[c] = jnp.sum(cf * cf)

    if debug_stage == "crop":                      # (1, 3, size, size)
        for c in range(3):
            out_ref[0, c] = crop[c].astype(jnp.float32)
        return

    # ---- standardization statistics (single-pass f32 moments, the
    # bf16 branch of preprocess._standardize) ---------------------------
    npix = float(size * size)
    mean = [s1[c] / npix for c in range(3)]
    inv = [1.0 / jnp.maximum(
        jnp.sqrt(jnp.maximum(s2[c] / npix - mean[c] * mean[c], 0.0)),
        1e-6) for c in range(3)]

    # ---- standardized phase planes, zero-padded for the {0,1} tap
    # offsets. Center-then-scale like the chain: scaling before the
    # subtraction cancels catastrophically on near-zero-variance crops
    # (inv ~ 1e6), and the zero pad then equals the chain's SAME pad of
    # the STANDARDIZED crop exactly. ------------------------------------
    scr_pl_ref[:] = jnp.zeros(scr_pl_ref.shape, dt)
    for c in range(3):
        std = ((crop[c].astype(jnp.float32) - mean[c]) * inv[c]).astype(dt)
        for mi in range(PIX_STRIDE):
            for mj in range(PIX_STRIDE):
                scr_pl_ref[c * 64 + mi * 8 + mj, 0:q, 0:q] = std[
                    mi * q:(mi + 1) * q, mj * q:(mj + 1) * q]

    if debug_stage == "stats":                     # (1, 8, 128) f32
        row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        val = jnp.zeros((8, 128), jnp.float32)
        for c in range(3):
            val = jnp.where(row == c, mean[c], val)
            val = jnp.where(row == 4 + c, inv[c], val)
        out_ref[0] = val
        return
    if debug_stage == "planes":                    # scr_pl snapshot
        out_ref[0] = scr_pl_ref[:].astype(jnp.float32)
        return

    # ---- im2col of the 12x12/s8 conv: every tap a static slice --------
    # The i2c scratch planes are PADDED to a sublane multiple (qp >= q,
    # qp % 8 == 0): Mosaic's minor-dim-merging reshape VIEW silently
    # reads the wrong lanes when the merged dims are not tile-aligned
    # (q = 28 broke; the stem's 104 worked) — measured on hardware by
    # tools/orient_bisect.py (i2c_raw exact, i2c garbage). Junk in the
    # pad columns only reaches the pad OUTPUT pixels of the matmul
    # (contraction is over the tap dim), which the final slice drops.
    qp = scr_i2c_ref.shape[-1]
    if debug_stage in ("i2c_raw", "i2c"):          # pad junk -> NaN
        scr_i2c_ref[:] = jnp.zeros(scr_i2c_ref.shape, dt)
    for uy in range(PIX_K):
        offy, my = uy // PIX_STRIDE, uy % PIX_STRIDE
        for ux in range(PIX_K):
            offx, mx = ux // PIX_STRIDE, ux % PIX_STRIDE
            for c in range(3):
                row = (uy * PIX_K + ux) * 3 + c
                scr_i2c_ref[row, 0:q, 0:q] = scr_pl_ref[
                    c * 64 + my * 8 + mx, offy:offy + q, offx:offx + q]

    if debug_stage == "i2c_raw":                  # (1, 432, qp, qp) f32
        out_ref[0] = scr_i2c_ref[:].astype(jnp.float32)
        return
    # conv epilogue WITHOUT flattening the scratch: Mosaic's minor-dim-
    # merging RefReshaper silently reads the wrong VMEM under this
    # kernel's PrefetchScalarGridSpec (hardware-measured by
    # orient_bisect.py: scratch contents exact, flattened view garbage
    # at raw-pixel magnitude, tile-aligned or not — unlike
    # pallas_stem's plain-grid kernels where the same view is
    # bit-exact), and a lane concat of the row planes hits the known
    # offset-mismatch trap (ops/pallas_csp.py). So: one matmul PER
    # OUTPUT ROW on that row's (432, qp) tap plane. (A row-major
    # scratch that would make the slices relayout-free is ALSO
    # unlowerable: the (1,q,q)->(q,1,q) store cast is rejected for
    # bf16 tiles.) 28 small MXU ops, a minor share of kernel FLOPs
    # next to the (H|W, size) resize matmuls.
    i2c3 = scr_i2c_ref[:]                          # (432, qp, qp)
    if debug_stage == "i2c":                      # (1, 432, qp, qp) f32
        out_ref[0] = i2c3.astype(jnp.float32)
        return
    s = s_ref[:]                                   # (1, F) f32
    t = t_ref[:]
    wmat = wmat_ref[:]
    ok = valid_ref[pl.program_id(0)] > 0
    # invalid crop == all-zero standardized input: conv(0)=0 -> relu(t)
    y0 = jnp.broadcast_to(jnp.maximum(t, 0.0), (q, fch))
    for py in range(q):
        acc = jax.lax.dot_general(                 # (qp, F) f32
            i2c3[:, py, :], wmat, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = jnp.maximum(acc * s + t, 0.0)[0:q]     # drop pad pixels
        out_ref[0, py] = jnp.where(ok, y, y0).astype(dt)


def orient_front_pallas(images: jnp.ndarray, boxes_xyxy: jnp.ndarray,
                        valid: jnp.ndarray, rig_idx: jnp.ndarray,
                        consts, size: int,
                        compute_dtype=jnp.bfloat16,
                        debug_stage: str | None = None) -> jnp.ndarray:
    """(R, H, W, 3)|(R, 3, H, W) frames + (N, 4) compacted boxes +
    (N,) validity + (N,) source-rig indices -> (N, S/8, S/8, F)
    post-ConvBN_0 activations of OrientationNetS2D (s2d_fold form).

    `consts` is the prepare_orient_constants fold. Sort the crop batch
    by rig_idx before calling: consecutive grid steps that read the
    same rig's frame skip the image DMA entirely."""
    dt = compute_dtype
    if images.shape[-1] == 3:                      # (R, H, W, 3)
        r, h, w, _ = images.shape
        img_p = images.astype(dt).transpose(0, 3, 1, 2)
    else:                                          # (R, 3, H, W)
        r, _, h, w = images.shape
        img_p = images.astype(dt)
    n = boxes_xyxy.shape[0]
    q = size // PIX_STRIDE
    fch = int(consts["wmat"].shape[1])

    ylo, yhi, yfr, xlo, xhi, xfr = jax.vmap(
        lambda b: box_axis_samples(b, h, w, size))(boxes_xyxy)
    # per-crop axis vectors travel as (N, 1, size): the Pallas TPU
    # block-shape rule wants the last two block dims 8/128-divisible OR
    # equal to the array dims — (1, 1, size) blocks satisfy the latter
    args = (ylo[:, None, :], yhi[:, None, :],
            yfr.astype(jnp.float32)[:, None, :],
            xlo[:, None, :], xhi[:, None, :],
            xfr.astype(jnp.float32)[:, None, :],
            jnp.asarray(consts["wmat"], dt),
            jnp.asarray(consts["s"], jnp.float32),
            jnp.asarray(consts["t"], jnp.float32))

    interp = jax.default_backend() != "tpu"
    kernel = functools.partial(_orient_kernel, size=size, h=h, w=w,
                               dt=dt, interp=interp,
                               debug_stage=debug_stage)
    # diagnostic taps (tools/orient_bisect.py): per-stage block shapes
    pq = max(32, -(-(q + 1) // 8) * 8)
    qp = -(-q // 8) * 8
    dbg_shapes = {"crop": (1, 3, size, size), "stats": (1, 8, 128),
                  "planes": (1, 192, pq, pq), "i2c": (1, 432, qp, qp),
                  "i2c_raw": (1, 432, qp, qp)}
    # scalar-prefetch index_map: crop i reads its rig's frame; the
    # per-crop operands block along the crop axis; constants are whole.
    per_crop = [
        pl.BlockSpec((1, 1, size), lambda i, rig, va: (i, 0, 0),
                     memory_space=pltpu.VMEM) for _ in range(6)]
    whole = [
        pl.BlockSpec(jnp.asarray(a).shape,
                     lambda i, rig, va, _nd=jnp.asarray(a).ndim:
                     (0,) * _nd,
                     memory_space=pltpu.VMEM) for a in args[6:]]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, 3, h, w),
                               lambda i, rig, va: (rig[i], 0, 0, 0),
                               memory_space=pltpu.VMEM)]
                 + per_crop + whole,
        out_specs=pl.BlockSpec(
            dbg_shapes[debug_stage] if debug_stage else (1, q, q, fch),
            lambda i, rig, va, _nd=(len(dbg_shapes[debug_stage])
                                    if debug_stage else 4):
            (i,) + (0,) * (_nd - 1),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            # phase planes need q+1 rows/cols (tap offsets {0,1});
            # sized from q so network_height > 248 doesn't OOB-slice
            # (min 32 keeps the shipped-config layout unchanged)
            pltpu.VMEM((192, max(32, -(-(q + 1) // 8) * 8),
                        max(32, -(-(q + 1) // 8) * 8)), dt),
            # i2c tap planes; see the RefReshaper note in the kernel
            # for why there is no flattened one-matmul form of this
            pltpu.VMEM((PIX_K * PIX_K * 3, -(-q // 8) * 8,
                        -(-q // 8) * 8), dt),
        ],
    )
    if debug_stage:
        out_sds = jax.ShapeDtypeStruct(
            (n,) + dbg_shapes[debug_stage][1:], jnp.float32)
    else:
        out_sds = _out_sds((n, q, q, fch), dt, img_p)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_sds,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(100 if dt == jnp.float32 else 40)
                             * 1024 * 1024),
        interpret=interp,
    )(rig_idx.astype(jnp.int32), valid.astype(jnp.int32),
      img_p, *args)
