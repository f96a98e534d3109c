"""Microbench crop_resize formulations on the TPU.

The round-3 device profile pinned the fleet chunk's top op to the
crop stage-2 batched einsum (convolution_convert_fusion.3, ~32 us/frame
at 64 rigs) running at ~3.7 TF/s — far below the ~85 TF/s a dense bf16
dot measures on this chip. Variants:

  A  current: einsum djx,yxc->dyjc then diy,dyjc->dijc (f32 accum,
     bf16 re-cast between stages)
  B  merged-minor: stage-2 as an explicit batched dot_general on
     tmp reshaped (d, y, j*c) so the minor dim is 192, not 3
  C  bf16 intermediate: stage-1 preferred_element_type=bf16 (kills the
     f32 tmp materialization + convert; 2-tap rows make accum error
     ~1 LSB of an 8-bit pixel)
  D  B + C combined
  E  y-first order (the pre-round-3 baseline, for reference)

Each timed as vmap over RIGS rigs x CAP crops inside a lax.scan chain
with readback sync (CLAUDE.md methodology).

Usage: python tools/bench_crop_variants.py [--rigs 64] [--iters 12]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rigs", type=int, default=64)
    ap.add_argument("--cap", type=int, default=8)
    ap.add_argument("--scan", type=int, default=8)
    ap.add_argument("--groups", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from grid_vision_tpu.ops import preprocess
    from grid_vision_tpu.types import Boxes
    from bench import readback

    H, W, S = 480, 640, 64
    rigs, cap = args.rigs, args.cap
    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (rigs, H, W, 3), jnp.bfloat16, 0, 255)

    def mk_boxes(k):
        x1 = jax.random.uniform(k, (cap,), jnp.float32, 0, W - 80)
        y1 = jax.random.uniform(k, (cap,), jnp.float32, 0, H - 80)
        wb = jax.random.uniform(k, (cap,), jnp.float32, 30, 70)
        return Boxes(
            xyxy=jnp.stack([x1, y1, x1 + wb, y1 + wb], -1),
            confidence=jnp.ones((cap,)),
            label=jnp.zeros((cap,), jnp.int32),
            valid=jnp.ones((cap,), bool))

    boxes_b = jax.vmap(mk_boxes)(jax.random.split(key, rigs))

    bf16 = jnp.bfloat16

    def weights(b):
        return jax.vmap(lambda bb: preprocess._box_weights(bb, H, W, S))(
            b.xyxy)

    def var_A(img, b):
        wy, wx = weights(b)
        wy = wy.astype(bf16); wx = wx.astype(bf16)
        tmp = jnp.einsum("djx,yxc->dyjc", wx, img,
                         preferred_element_type=jnp.float32)
        return jnp.einsum("diy,dyjc->dijc", wy, tmp.astype(bf16),
                          preferred_element_type=jnp.float32)

    def var_B(img, b):
        wy, wx = weights(b)
        wy = wy.astype(bf16); wx = wx.astype(bf16)
        tmp = jnp.einsum("djx,yxc->dyjc", wx, img,
                         preferred_element_type=jnp.float32)
        t2 = tmp.astype(bf16).reshape(cap, H, S * 3)
        out = jax.lax.dot_general(
            wy, t2, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return out.reshape(cap, S, S, 3)

    def var_C(img, b):
        wy, wx = weights(b)
        wy = wy.astype(bf16); wx = wx.astype(bf16)
        tmp = jnp.einsum("djx,yxc->dyjc", wx, img,
                         preferred_element_type=bf16)
        return jnp.einsum("diy,dyjc->dijc", wy, tmp,
                          preferred_element_type=jnp.float32)

    def var_D(img, b):
        wy, wx = weights(b)
        wy = wy.astype(bf16); wx = wx.astype(bf16)
        tmp = jnp.einsum("djx,yxc->dyjc", wx, img,
                         preferred_element_type=bf16)
        t2 = tmp.reshape(cap, H, S * 3)
        out = jax.lax.dot_general(
            wy, t2, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return out.reshape(cap, S, S, 3)

    def var_E(img, b):
        wy, wx = weights(b)
        wy = wy.astype(bf16); wx = wx.astype(bf16)
        tmp = jnp.einsum("diy,yxc->dixc", wy, img,
                         preferred_element_type=jnp.float32)
        return jnp.einsum("djx,dixc->dijc", wx, tmp.astype(bf16),
                          preferred_element_type=jnp.float32)

    variants = {"A_current": var_A, "B_minor192": var_B,
                "C_bf16tmp": var_C, "D_B+C": var_D, "E_yfirst": var_E}

    ref = None
    for name, fn in variants.items():
        @functools.partial(jax.jit)
        def chain(imgs, boxes_b, k, fn=fn):
            def body(acc, kk):
                jit_ = jax.random.uniform(kk, (), bf16, -1, 1)
                crops = jax.vmap(fn)(imgs + jit_, boxes_b)
                return acc + jnp.sum(crops.astype(jnp.float32)), ()
            acc, _ = jax.lax.scan(body, jnp.zeros(()),
                                  jax.random.split(k, args.scan))
            return acc

        out = chain(imgs, boxes_b, jax.random.PRNGKey(1))
        _ = readback(out)
        t = time.perf_counter()
        _ = readback(chain(imgs, boxes_b, jax.random.PRNGKey(1)))
        sync = time.perf_counter() - t

        rates = []
        for g in range(args.groups):
            n = 6
            t0 = time.perf_counter()
            for i in range(n):
                out = chain(imgs, boxes_b, jax.random.PRNGKey(2 + g * n + i))
            _ = readback(out)
            dt = time.perf_counter() - t0 - sync
            if dt > 0:
                rates.append(n * args.scan * rigs / dt)
        med = float(np.median(rates))
        us = 1e6 / med
        # numeric check vs variant A on one batch
        crops = jax.vmap(fn)(imgs, boxes_b)
        if ref is None:
            ref = np.asarray(crops, np.float32)
            err = 0.0
        else:
            err = float(np.max(np.abs(np.asarray(crops, np.float32) - ref)))
        print(f"{name:11s} {med:9.0f} crops-of-frames/s  "
              f"{us:6.1f} us/frame  max|d - A| {err:.3f}")


if __name__ == "__main__":
    main()
