"""Characterize WHICH detections flip between the bf16/f32 chains and
how much of the vision-mode grid gap they explain (VERDICT r4 #1).

parity_isolate.py attributes the production-vs-compat vision gap to
config axes; this tool attributes it to MECHANISM within a step. Both
chains are run from a COMMON grid state each step (the compat chain
carries it), so every number is a per-step effect, and the fuse stage
is cross-fed:

    grid        boxes from   math/dtype   isolates
    g_cc        compat       f32/xla      (the reference chain)
    g_pp        production   bf16/pallas  total per-step gap
    g_pc        compat       bf16/pallas  post-detector numerics only
    g_cp        production   f32/xla      detector box flips only

Per step we also log the box-level diff between the two NMS survivor
sets (matched by same-label IoU >= 0.5): unmatched counts each way,
max matched coordinate delta (px), max confidence delta, and whether
the survivor CARDINALITY differs. Correlating `any_flip` with
agree(g_cp, g_cc) answers "is the gap detector-precision variation?"
— the round-4 hypothesis (PARITY.json e2e characterization; the
reference's own TRT-fp16-vs-ONNX-f32 gap is the analogous effect,
/root/reference/src/object_detection.cpp:61-91).

Usage:
    python tools/parity_boxflip.py --cpu --rigs 4 --steps 8
    python tools/parity_boxflip.py --rigs 16 --steps 24   # hardware
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def box_diff_stats(jnp, bp, bc):
    """Vectorized survivor-set diff between two padded Boxes pytrees."""
    vp = bp.valid
    vc = bc.valid
    # pairwise IoU (Dp, Dc)
    a = bp.xyxy[:, None, :]
    b = bc.xyxy[None, :, :]
    ix0 = jnp.maximum(a[..., 0], b[..., 0])
    iy0 = jnp.maximum(a[..., 1], b[..., 1])
    ix1 = jnp.minimum(a[..., 2], b[..., 2])
    iy1 = jnp.minimum(a[..., 3], b[..., 3])
    inter = (jnp.maximum(ix1 - ix0, 0.0) * jnp.maximum(iy1 - iy0, 0.0))
    area_p = ((a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1]))
    area_c = ((b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1]))
    iou = inter / jnp.maximum(area_p + area_c - inter, 1e-6)
    ok = (vp[:, None] & vc[None, :]
          & (bp.label[:, None] == bc.label[None, :]))
    iou = jnp.where(ok, iou, -1.0)
    best_c = jnp.argmax(iou, axis=1)                    # for each p
    best_iou_p = jnp.max(iou, axis=1)
    matched_p = vp & (best_iou_p >= 0.5)
    matched_c = vc & (jnp.max(iou, axis=0) >= 0.5)
    unmatched_p = jnp.sum(vp & ~matched_p)
    unmatched_c = jnp.sum(vc & ~matched_c)
    # matched-pair deltas
    part = bc.xyxy[best_c]
    dcoord = jnp.abs(bp.xyxy - part).max(axis=-1)
    dconf = jnp.abs(bp.confidence - bc.confidence[best_c])
    m = matched_p
    max_dcoord = jnp.max(jnp.where(m, dcoord, 0.0))
    max_dconf = jnp.max(jnp.where(m, dconf, 0.0))
    return dict(
        n_p=jnp.sum(vp), n_c=jnp.sum(vc),
        unmatched_p=unmatched_p, unmatched_c=unmatched_c,
        max_dcoord=max_dcoord, max_dconf=max_dconf,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rigs", type=int, default=8)
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="PARITY_BOXFLIP.json")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bench import (apply_perturbation, build_obs_pool,
                       draw_perturbations)
    from grid_vision_tpu import pipeline
    from grid_vision_tpu.config import GridVisionConfig
    from grid_vision_tpu.types import GridState, Obs

    stem = "xla" if args.cpu else "pallas"
    common = dict(
        max_points=8192, use_vision_orientation=True,
        detection_weights_file="weights/detector.npz",
        vision_weights_file="weights/orientation.npz")
    prod_cfg = GridVisionConfig(
        compute_dtype="bfloat16", detector_stem_backend=stem,
        orientation_stem_backend="xla", max_static_depth=16, **common)
    comp_cfg = GridVisionConfig(compute_dtype="float32", **common)
    prod = pipeline.Engine(prod_cfg, seed=0)
    comp = pipeline.Engine(comp_cfg, seed=0)

    pool32 = build_obs_pool(comp_cfg, args.rigs)
    pool_bf = Obs(image=pool32.image.astype(jnp.bfloat16),
                  cloud=pool32.cloud, has_image=pool32.has_image,
                  has_cloud=pool32.has_cloud)

    det_p = jax.vmap(
        functools.partial(pipeline.detect_with_stats, cfg=prod_cfg),
        in_axes=(None, 0))
    det_c = jax.vmap(
        functools.partial(pipeline.detect_with_stats, cfg=comp_cfg),
        in_axes=(None, 0))

    def mk_fuse(cfg):
        f = functools.partial(pipeline.fuse, cfg=cfg)
        return jax.vmap(lambda p, s, o, b, e: f(p, s, o, b, e),
                        in_axes=(None, 0, 0, 0, None))

    fuse_p = mk_fuse(prod_cfg)
    fuse_c = mk_fuse(comp_cfg)

    def agree(a, b):
        return (jnp.abs(a.astype(jnp.int32) - b.astype(jnp.int32))
                <= 1).mean(axis=(1, 2))                 # per-rig

    @jax.jit
    def chunk(s0, bright_t, jitter_t):
        def body(s, bj):
            obs32 = apply_perturbation(pool32, bj[0], bj[1])
            obsbf = apply_perturbation(pool_bf, bj[0], bj[1])
            bp, _ = det_p(prod.params, obsbf.image)
            bc, _ = det_c(comp.params, obs32.image)
            # common state s into all four fuse variants
            s_cc, o_cc = fuse_c(comp.params, s, obs32, bc,
                                comp.extrinsics)
            _, o_pp = fuse_p(prod.params, s, obsbf, bp,
                             prod.extrinsics)
            _, o_pc = fuse_p(prod.params, s, obsbf, bc,
                             prod.extrinsics)
            _, o_cp = fuse_c(comp.params, s, obs32, bp,
                             comp.extrinsics)
            g = o_cc.occupancy_i8
            stats = jax.vmap(lambda p_, c_: box_diff_stats(jnp, p_, c_))(
                bp, bc)
            rec = dict(
                agree_pp=agree(o_pp.occupancy_i8, g),
                agree_pc=agree(o_pc.occupancy_i8, g),
                agree_cp=agree(o_cp.occupancy_i8, g),
                **stats)
            return s_cc, rec
        return jax.lax.scan(body, s0, (bright_t, jitter_t))

    key = jax.random.PRNGKey(args.seed)
    bright_t, jitter_t = draw_perturbations(key, args.steps, args.rigs)
    s0 = GridState.create_batch(comp_cfg, args.rigs)
    t0 = time.perf_counter()
    _, rec = chunk(s0, bright_t, jitter_t)
    rec = {k: np.asarray(v) for k, v in rec.items()}    # (T, R)
    dt = time.perf_counter() - t0

    flips = (rec["unmatched_p"] + rec["unmatched_c"]) > 0
    moved = rec["max_dcoord"] > 0.5                     # crop-visible
    clean = ~flips & ~moved
    out = {
        "rigs": args.rigs, "steps": args.steps,
        "backend": jax.devices()[0].platform,
        "frames": int(flips.size),
        "seconds": round(dt, 1),
        "frames_with_survivor_flip": int(flips.sum()),
        "frames_with_box_move_gt_half_px": int((moved & ~flips).sum()),
        "frames_clean": int(clean.sum()),
        "mean_boxes_per_frame": float(rec["n_c"].mean()),
        "agreement_vs_compat": {
            "total_bf16_chain_own_boxes": float(rec["agree_pp"].mean()),
            "post_detector_only (compat boxes into bf16 fuse)":
                float(rec["agree_pc"].mean()),
            "detector_only (bf16 boxes into f32 fuse)":
                float(rec["agree_cp"].mean()),
        },
        "conditional_detector_only_agreement": {
            "frames_with_flip": float(rec["agree_cp"][flips].mean())
                if flips.any() else None,
            "frames_with_move_only":
                float(rec["agree_cp"][moved & ~flips].mean())
                if (moved & ~flips).any() else None,
            "clean_frames": float(rec["agree_cp"][clean].mean())
                if clean.any() else None,
        },
        "matched_box_deltas": {
            "max_coord_px": float(rec["max_dcoord"].max()),
            "mean_frame_max_coord_px": float(rec["max_dcoord"].mean()),
            "max_conf": float(rec["max_dconf"].max()),
        },
        "survivor_flips": {
            "mean_unmatched_prod_per_frame":
                float(rec["unmatched_p"].mean()),
            "mean_unmatched_compat_per_frame":
                float(rec["unmatched_c"].mean()),
        },
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
