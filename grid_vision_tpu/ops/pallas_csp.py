"""Pallas TPU kernel: fused first CSP stage of the detector.

Continues where ops/pallas_stem.py stops: one VMEM-resident kernel per
image computing

    (104, 104, 64) stage-2 activation
      -> 3x3 conv (64->64) + BN + leaky          [ConvBN_2]
      -> CSP block: 3x3 (32->32) + 3x3 (32->32)  [CSPBlock_0]
                    + 1x1 (64->64), partial/full concats
      -> 2x2/s2 max pool
      -> (52, 52, 128) stage-3 activation

selected by detector_stem_backend="pallas2" (stem kernel + this one).
The round-3 device profile put this stage at ~39 us/frame in XLA
(12.4 + 9.0 + 3.8 + 6.4 us of thin-N convs + 7.3 us reduce_window).

Design (same Mosaic survival rules as the stem kernel, CLAUDE.md):

  - Everything runs PHASE-DECOMPOSED on the maxpool's stride-2 grid:
    activations live as 4 phase planes (C, 52, 52). A stride-1 3x3
    conv maps phases to phases with STATIC slice offsets (input pixel
    2i2+pi+dy-1 lives in phase (pi+dy-1)%2 at index i2+floor((pi+dy-1)
    /2)), and the 2x2/s2 max pool becomes an ELEMENTWISE max over the
    four phase planes — no strided vector ops anywhere.
  - The CSP 3x3 convs (K=288, N=32 — 3/4 of the MXU lanes idle) pack
    all four output phases block-diagonally into ONE K=1152/N=128
    matmul; the 1x1 packs phase pairs (K=128/N=128).
  - im2col flattens ride scratch-ref reshape views; conv outputs are
    stored through flat (C, Q*Q) scratch rows and read back through
    (4, C, Q, Q) views.

The host-side phase split of the stem output is plain XLA (strided
slices are fine there). Equivalence with the XLA chain is pinned by
tests/test_pallas_stem.py. Reference workload:
/root/reference/src/object_detection.cpp:61-106 (the ONNX yolov4
backbone this stage re-implements).

Do NOT jax.vmap this call (kernel grid is the batch; see
ops/pallas_raycast.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_stem import (_block_diag_pack, _flat_view, _fold_bn,
                          _full_spec, _leaky, _out_sds)


# ---------------------------------------------------------------------------
# Host-side constant preparation
# ---------------------------------------------------------------------------

def prepare_csp_constants(variables):
    """Fold ConvBN_2 + CSPBlock_0 weights into the kernel's matmul
    operands (block-diagonal phase packs; K-order (dy, dx, c))."""
    p = variables["params"]
    s = variables["batch_stats"]
    xp = jnp if isinstance(p["ConvBN_2"]["Conv_0"]["kernel"],
                           jax.core.Tracer) else np

    def conv_fold(scope_p, scope_s, k, cin, cout, pack):
        w = xp.asarray(scope_p["Conv_0"]["kernel"],
                       xp.float32).reshape(k * k * cin, cout)
        sc, sh = _fold_bn(scope_p["BatchNorm_0"], scope_s["BatchNorm_0"],
                          xp)
        return (_block_diag_pack(w, pack, xp),
                xp.tile(sc, pack).reshape(1, pack * cout),
                xp.tile(sh, pack).reshape(1, pack * cout))

    w2, s2, b2 = conv_fold(p["ConvBN_2"], s["ConvBN_2"], 3, 64, 64,
                           pack=1)
    csp_p, csp_s = p["CSPBlock_0"], s["CSPBlock_0"]
    wa, sa, ba = conv_fold(csp_p["ConvBN_0"], csp_s["ConvBN_0"], 3, 32,
                           32, pack=2)
    wb, sb, bb = conv_fold(csp_p["ConvBN_1"], csp_s["ConvBN_1"], 3, 32,
                           32, pack=2)
    wc, sc_, bc = conv_fold(csp_p["ConvBN_2"], csp_s["ConvBN_2"], 1, 64,
                            64, pack=2)
    return dict(w2=w2, s2=s2, b2=b2, wa=wa, sa=sa, ba=ba,
                wb=wb, sb=sb, bb=bb, wc=wc, sc=sc_, bc=bc)


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

def _phase_tap(planes, g_out, dy, dx, cin0, cin1, q):
    """planes: (4, C, q+2, q+2) padded phase planes (border = the
    104-grid SAME pad). Static slice of the source phase for output
    phase g_out's tap (dy, dx), channels [cin0:cin1)."""
    pi, pj = divmod(g_out, 2)
    gy, oy = (pi + dy - 1) % 2, (pi + dy - 1 + 2) // 2  # oy in {0,1,2}
    gx, ox = (pj + dx - 1) % 2, (pj + dx - 1 + 2) // 2
    return planes[gy * 2 + gx, cin0:cin1, oy:oy + q, ox:ox + q]


def _csp_kernel(xph_ref, w2_ref, s2_ref, b2_ref, wa_ref, sa_ref, ba_ref,
                wb_ref, sb_ref, bb_ref, wc_ref, sc_ref, bc_ref,
                out_ref, scrA_ref, scrC_ref, scrD_ref,
                scrF_ref, *, q: int, dt, interp: bool):
    mqq = q * q
    xph = xph_ref[0]                         # (4, 64, q+2, q+2) padded

    # ---- ConvBN_2 (3x3 64->64), one matmul per output phase -----------
    # scrA is a flat (576, q, q) tap buffer shared by conv2 (9 taps x
    # 64ch) and the CSP convs (2 phases x 9 taps x 32ch) — same bytes
    for g in range(4):
        t = 0
        for dy in range(3):
            for dx in range(3):
                scrA_ref[t * 64:(t + 1) * 64] = _phase_tap(
                    xph, g, dy, dx, 0, 64, q)
                t += 1
        i2c = _flat_view(scrA_ref, (576, mqq), interp)
        acc = jax.lax.dot_general(
            w2_ref[:], i2c, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = _leaky(acc * s2_ref[0][:, None] + b2_ref[0][:, None])
        scrF_ref[g] = acc.astype(dt)         # (64, mqq)
    # padded phase planes of conv2's output (the CSP block's `x`)
    xpad = jnp.pad(_flat_view(scrF_ref, (4, 64, q, q), interp),
                   ((0, 0), (0, 0), (1, 1), (1, 1)))

    # ---- CSP 3x3 convs (32->32), phase pairs block-diagonal -----------
    def csp_conv(planes, cin0, w_ref, s_ref, b_ref):
        for pair in range(2):
            for gl in range(2):
                g = pair * 2 + gl
                t = 0
                for dy in range(3):
                    for dx in range(3):
                        r0 = gl * 288 + t * 32
                        scrA_ref[r0:r0 + 32] = _phase_tap(
                            planes, g, dy, dx, cin0, cin0 + 32, q)
                        t += 1
            i2c = _flat_view(scrA_ref, (2 * 288, mqq), interp)
            acc = jax.lax.dot_general(
                w_ref[:], i2c, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = _leaky(acc * s_ref[0][:, None] + b_ref[0][:, None])
            scrD_ref[pair] = acc.astype(dt)  # (64, mqq): 2 phases x 32
        # (4, 32, q+2, q+2) padded planes via the scrD view
        pl4 = _flat_view(scrD_ref, (2, 2, 32, q, q), interp).reshape(
            4, 32, q, q)
        return jnp.pad(pl4, ((0, 0), (0, 0), (1, 1), (1, 1)))

    x1pad = csp_conv(xpad, 32, wa_ref, sa_ref, ba_ref)
    x2pad = csp_conv(x1pad, 0, wb_ref, sb_ref, bb_ref)

    # ---- CSP ConvBN_2 (1x1 on concat(x2, x1)), phase pairs ------------
    # scrF is free again (conv2's planes were consumed into xpad)
    for pair in range(2):
        for gl in range(2):
            g = pair * 2 + gl
            scrC_ref[gl, 0:32] = x2pad[g, :, 1:1 + q, 1:1 + q]
            scrC_ref[gl, 32:64] = x1pad[g, :, 1:1 + q, 1:1 + q]
        i2c = _flat_view(scrC_ref, (128, mqq), interp)
        acc = jax.lax.dot_general(
            wc_ref[:], i2c, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = _leaky(acc * sc_ref[0][:, None] + bc_ref[0][:, None])
        scrF_ref[2 * pair:2 * pair + 2] = acc.astype(dt).reshape(
            2, 64, mqq)
    x3 = _flat_view(scrF_ref, (4, 64, q, q), interp)

    # ---- concat(x, x3) + 2x2/s2 max pool = elementwise phase max ------
    # x here is the CSP block's INPUT = conv2's output, per
    # CSPBlock.__call__'s `out = concat([x, x3])`
    cat = jnp.concatenate([xpad[:, :, 1:1 + q, 1:1 + q], x3], axis=1)
    out_ref[0] = jnp.max(cat, axis=0)        # (128, q, q) planar; the
    # NHWC transpose happens in XLA outside (it would insert one for
    # the next conv's layout anyway)


# ---------------------------------------------------------------------------
# Entry point
# ---------------------------------------------------------------------------

def prepare_csp_flat_constants(variables):
    """Constant fold for the FLAT-layout CSP kernel (detector_csp_flat,
    backend "pallas3"): same weights as prepare_csp_constants but
    ConvBN_2 packs TWO output phases block-diagonally (K=1152, N=128 —
    full MXU lanes; the pack=1 form runs N=64)."""
    p = variables["params"]
    s = variables["batch_stats"]
    xp = jnp if isinstance(p["ConvBN_2"]["Conv_0"]["kernel"],
                           jax.core.Tracer) else np

    def conv_fold(scope_p, scope_s, k, cin, cout, pack):
        w = xp.asarray(scope_p["Conv_0"]["kernel"],
                       xp.float32).reshape(k * k * cin, cout)
        sc, sh = _fold_bn(scope_p["BatchNorm_0"], scope_s["BatchNorm_0"],
                          xp)
        return (_block_diag_pack(w, pack, xp),
                xp.tile(sc, pack).reshape(1, pack * cout),
                xp.tile(sh, pack).reshape(1, pack * cout))

    w2, s2, b2 = conv_fold(p["ConvBN_2"], s["ConvBN_2"], 3, 64, 64,
                           pack=2)
    csp_p, csp_s = p["CSPBlock_0"], s["CSPBlock_0"]
    wa, sa, ba = conv_fold(csp_p["ConvBN_0"], csp_s["ConvBN_0"], 3, 32,
                           32, pack=2)
    wb, sb, bb = conv_fold(csp_p["ConvBN_1"], csp_s["ConvBN_1"], 3, 32,
                           32, pack=2)
    wc, sc_, bc = conv_fold(csp_p["ConvBN_2"], csp_s["ConvBN_2"], 1, 64,
                            64, pack=2)
    return dict(w2=w2, s2=s2, b2=b2, wa=wa, sa=sa, ba=ba,
                wb=wb, sb=sb, bb=bb, wc=wc, sc=sc_, bc=bc)


def _flat_tap_off(g_out: int, dy: int, dx: int, pitch: int):
    """Flat offset + source phase of _phase_tap's slice when the padded
    (q+2, q+2) phase plane is stored ROW-MAJOR FLAT with pitch q+2: the
    (oy:oy+q, ox:ox+q) 2D window becomes ONE unit-stride slice
    [oy*pitch+ox : oy*pitch+ox + q*pitch) whose only artifacts are 2
    junk columns per row (output cols j in {q, q+1}, identical for every
    tap), masked to zero before stores land them in halo cells."""
    pi, pj = divmod(g_out, 2)
    gy, oy = (pi + dy - 1) % 2, (pi + dy - 1 + 2) // 2
    gx, ox = (pj + dx - 1) % 2, (pj + dx - 1 + 2) // 2
    return gy * 2 + gx, oy * pitch + ox


def _csp_flat_kernel(xflat_ref, mask_ref, w2_ref, s2_ref, b2_ref,
                     wa_ref, sa_ref, ba_ref, wb_ref, sb_ref, bb_ref,
                     wc_ref, sc_ref, bc_ref, out_ref,
                     scrT_ref, scrY2_ref, scrX1_ref, scrX2_ref,
                     scrC_ref, *, q: int, dt):
    """FLAT-layout variant of _csp_kernel (backend "pallas3").

    Every activation lives as phase planes flattened row-major WITH
    their SAME-pad halo: (4, C, P) where P = (q+2)^2. A 3x3 tap is then
    ONE contiguous (C, q*(q+2)) slice — fully lane-aligned VMEM traffic,
    unlike _csp_kernel's (C, 52, 52) 2D slabs whose minor dim fills 52
    of 128 lanes (the measured reason pallas2 lost; docs/PERF.md). The
    2 junk columns per row that ride the flat window are masked to zero
    and land EXACTLY in the destination's left/right halo cells, so the
    zero-halo invariant is self-maintaining; only the top/bottom halo
    strips need explicit zeroing per buffer."""
    pitch = q + 2
    # flat planes carry ONE extra zero tail row (pitch cells) so the
    # bottom-row taps' junk columns can read past the last padded row
    # (they wrap to "the next row", which must exist to slice)
    P = pitch * pitch + pitch
    L = q * pitch
    lo = pitch + 1                       # interior store offset (1, 1)
    mask = mask_ref[0]                   # (L,) f32: 0 at junk columns
    xflat = xflat_ref[0]                 # (4, 64, P)

    def store(scr, g, c0, acc):
        """mask + round + store one phase's (C, L) conv output into the
        interior of its flat padded plane."""
        scr[g, c0:c0 + acc.shape[0], lo:lo + L] = (
            (acc * mask[None, :]).astype(dt))

    def zero_halo(scr, nph, c):
        for g in range(nph):
            scr[g, :, 0:lo] = jnp.zeros((c, lo), dt)
            scr[g, :, lo + L:P] = jnp.zeros((c, P - lo - L), dt)

    zero_halo(scrY2_ref, 4, 64)
    zero_halo(scrX1_ref, 4, 32)
    zero_halo(scrX2_ref, 4, 32)

    # ---- ConvBN_2 (3x3 64->64), TWO phases per matmul (K=1152, N=128) -
    for pair in range(2):
        for gl in range(2):
            g = pair * 2 + gl
            t = 0
            for dy in range(3):
                for dx in range(3):
                    s, off = _flat_tap_off(g, dy, dx, pitch)
                    scrT_ref[gl * 576 + t * 64:gl * 576 + (t + 1) * 64] \
                        = xflat[s, :, off:off + L]
                    t += 1
        acc = jax.lax.dot_general(
            w2_ref[:], scrT_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # (128, L)
        acc = _leaky(acc * s2_ref[0][:, None] + b2_ref[0][:, None])
        for gl in range(2):
            store(scrY2_ref, pair * 2 + gl, 0, acc[gl * 64:(gl + 1) * 64])

    # ---- CSP 3x3 convs (32->32), phase pairs (K=576, N=64) ------------
    def csp_conv(src_ref, cin0, w_ref, s_ref, b_ref, dst_ref):
        for pair in range(2):
            for gl in range(2):
                g = pair * 2 + gl
                t = 0
                for dy in range(3):
                    for dx in range(3):
                        s, off = _flat_tap_off(g, dy, dx, pitch)
                        scrT_ref[gl * 288 + t * 32:
                                 gl * 288 + (t + 1) * 32] \
                            = src_ref[s, cin0:cin0 + 32, off:off + L]
                        t += 1
            acc = jax.lax.dot_general(
                w_ref[:], scrT_ref[0:576], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (64, L)
            acc = _leaky(acc * s_ref[0][:, None] + b_ref[0][:, None])
            for gl in range(2):
                store(dst_ref, pair * 2 + gl, 0,
                      acc[gl * 32:(gl + 1) * 32])

    csp_conv(scrY2_ref, 32, wa_ref, sa_ref, ba_ref, scrX1_ref)
    csp_conv(scrX1_ref, 0, wb_ref, sb_ref, bb_ref, scrX2_ref)

    # ---- CSP ConvBN_2 (1x1 on concat(x2, x1)), phase pairs ------------
    # x3's junk columns carry leaky(bias) garbage (the 1x1 reads halo
    # zeros there) — harmless: the pool max below keeps them junk and
    # the XLA caller slices them away.
    x3 = [None] * 4
    for pair in range(2):
        for gl in range(2):
            g = pair * 2 + gl
            scrC_ref[gl * 64:gl * 64 + 32] = scrX2_ref[g, :, lo:lo + L]
            scrC_ref[gl * 64 + 32:gl * 64 + 64] = \
                scrX1_ref[g, :, lo:lo + L]
        acc = jax.lax.dot_general(
            wc_ref[:], scrC_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # (128, L)
        acc = _leaky(acc * sc_ref[0][:, None] + bc_ref[0][:, None])
        for gl in range(2):
            x3[pair * 2 + gl] = acc[gl * 64:(gl + 1) * 64].astype(dt)

    # ---- concat(y2, x3) + 2x2/s2 max pool = elementwise phase max -----
    # (written as two channel-half stores: Mosaic cannot concatenate
    # values whose tiles carry different internal lane offsets — the
    # interior y2 slices sit at offset `lo` while x3 is offset 0)
    y2 = [scrY2_ref[g, :, lo:lo + L] for g in range(4)]
    out_ref[0, 0:64] = jnp.maximum(jnp.maximum(y2[0], y2[1]),
                                   jnp.maximum(y2[2], y2[3]))
    out_ref[0, 64:128] = jnp.maximum(jnp.maximum(x3[0], x3[1]),
                                     jnp.maximum(x3[2], x3[3]))


def detector_csp_flat(x: jnp.ndarray, variables,
                      compute_dtype=jnp.bfloat16,
                      consts=None) -> jnp.ndarray:
    """(B, 104, 104, 64) stage-2 activations -> (B, 52, 52, 128): the
    same ConvBN_2 + CSPBlock_0 + max_pool fusion as detector_csp_pallas
    but with flat lane-aligned activations (backend "pallas3")."""
    b, hh, _, cc = x.shape
    assert cc == 64 and hh % 2 == 0
    q = hh // 2
    pitch = q + 2
    P = pitch * pitch + pitch            # + one zero tail row (kernel)
    L = q * pitch
    dt = compute_dtype
    if consts is None:
        consts = prepare_csp_flat_constants(variables)
    # host-XLA phase split + SAME pad + flatten: (B, 4, 64, P)
    xp = x.astype(dt).transpose(0, 3, 1, 2)           # (B, 64, 2q, 2q)
    planes = jnp.stack(
        [xp[:, :, pi::2, pj::2] for pi in (0, 1) for pj in (0, 1)],
        axis=1)                                       # (B, 4, 64, q, q)
    planes = jnp.pad(planes, ((0, 0), (0, 0), (0, 0), (1, 1), (1, 1)))
    planes = planes.reshape(b, 4, 64, pitch * pitch)
    planes = jnp.pad(planes, ((0, 0), (0, 0), (0, 0), (0, pitch)))

    mask = np.ones((1, L), np.float32)
    mask[0, np.arange(L) % pitch >= q] = 0.0
    mask = jnp.asarray(mask)

    args = (mask,) + tuple(
        jnp.asarray(consts[k], dt if k in ("w2", "wa", "wb", "wc")
                    else jnp.float32)
        for k in ("w2", "s2", "b2", "wa", "sa", "ba",
                  "wb", "sb", "bb", "wc", "sc", "bc"))
    interp = jax.default_backend() != "tpu"
    kernel = functools.partial(_csp_flat_kernel, q=q, dt=dt)
    out_sds = _out_sds((b, 128, L), dt, planes)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, 4, 64, P), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)]
                 + [_full_spec(a) for a in args],
        out_specs=pl.BlockSpec((1, 128, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_sds,
        scratch_shapes=[
            pltpu.VMEM((1152, L), dt),           # shared i2c tap buffer
            pltpu.VMEM((4, 64, P), dt),          # conv2 out (flat padded)
            pltpu.VMEM((4, 32, P), dt),          # csp x1
            pltpu.VMEM((4, 32, P), dt),          # csp x2
            pltpu.VMEM((128, L), dt),            # 1x1 input (pairs)
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interp,
    )(planes, *args)
    # (B, 128, L) -> drop the junk columns -> NHWC
    out = out.reshape(b, 128, q, pitch)[:, :, :, :q]
    return out.transpose(0, 2, 3, 1)                  # (B, q, q, 128)


def detector_csp_pallas(x: jnp.ndarray, variables,
                        compute_dtype=jnp.bfloat16,
                        consts=None) -> jnp.ndarray:
    """(B, 104, 104, 64) stage-2 activations -> (B, 52, 52, 128) post-
    CSP/pool stage-3 activations (ConvBN_2 + CSPBlock_0 + max_pool)."""
    b, hh, _, cc = x.shape
    assert cc == 64 and hh % 2 == 0
    q = hh // 2
    dt = compute_dtype
    if consts is None:
        consts = prepare_csp_constants(variables)
    # host-XLA phase split + SAME pad: (B, 4, 64, q+2, q+2)
    xp = x.astype(dt).transpose(0, 3, 1, 2)           # (B, 64, 2q, 2q)
    planes = jnp.stack(
        [xp[:, :, pi::2, pj::2] for pi in (0, 1) for pj in (0, 1)],
        axis=1)                                       # (B, 4, 64, q, q)
    planes = jnp.pad(planes, ((0, 0), (0, 0), (0, 0), (1, 1), (1, 1)))

    args = tuple(
        jnp.asarray(consts[k], dt if k in ("w2", "wa", "wb", "wc")
                    else jnp.float32)
        for k in ("w2", "s2", "b2", "wa", "sa", "ba",
                  "wb", "sb", "bb", "wc", "sc", "bc"))
    interp = jax.default_backend() != "tpu"
    kernel = functools.partial(_csp_kernel, q=q, dt=dt, interp=interp)
    out_sds = _out_sds((b, 128, q, q), dt, planes)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, 4, 64, q + 2, q + 2),
                               lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)]
                 + [_full_spec(a) for a in args],
        out_specs=pl.BlockSpec((1, 128, q, q), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_sds,
        scratch_shapes=[
            pltpu.VMEM((576, q, q), dt),         # shared i2c tap buffer
            pltpu.VMEM((2, 64, q, q), dt),       # 1x1 input (pairs)
            pltpu.VMEM((2, 64, q * q), dt),      # csp conv outputs
            pltpu.VMEM((4, 64, q * q), dt),      # conv2 / 1x1 outputs
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interp,
    )(planes, *args)
    return out.transpose(0, 2, 3, 1)                  # (B, q, q, 128)
