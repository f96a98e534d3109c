"""Per-component wall-time ablation of the fused step on the live device.

Compiles a sequence of partial pipelines (detector only -> +decode/NMS ->
+static association -> +orientation -> full) and measures warm per-frame
time for each; the deltas localize the hot component. Methodology as in
bench.py (scan-fused steps, on-device obs, scalar readback sync).

Usage: python tools/perf_ablate.py [--rigs 32] [--scan 4] [--stages a,b,...]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from grid_vision_tpu import pipeline  # noqa: E402
from grid_vision_tpu.config import GridVisionConfig  # noqa: E402
from grid_vision_tpu.geometry import (intrinsic_inverse,  # noqa: E402
                                      intrinsic_matrix, pixel_to_3d,
                                      transform_points)
from grid_vision_tpu.models import yolov4_tiny  # noqa: E402
from grid_vision_tpu.ops import association, preprocess  # noqa: E402
from grid_vision_tpu.ops.decode import extract_boxes  # noqa: E402
from grid_vision_tpu.ops import rasterize  # noqa: E402
from grid_vision_tpu.types import GridState, LShapePoses  # noqa: E402
from bench import readback, synth_obs  # noqa: E402


def build_stage(cfg, stage: str):
    """Returns step_fn(params, state, obs, extr) -> state for a prefix of
    the pipeline."""
    ycfg = yolov4_tiny.YoloConfig(input_size=cfg.resize,
                                  compute_dtype=jnp.bfloat16)

    def stage_fn(params, state, obs, extr):
        K = intrinsic_matrix(cfg.fx, cfg.fy, cfg.cx, cfg.cy)
        acc = jnp.float32(0)
        if stage >= "a":  # detector forward
            net = preprocess.preprocess_detector_image(obs.image, cfg.resize, compute_dtype=jnp.bfloat16)
            b, c = yolov4_tiny.forward(params["detector"], net[None], ycfg)
            acc = acc + jnp.sum(b[0, 0]) + jnp.sum(c[0, 0])
        if stage >= "b":  # + decode/NMS
            boxes = extract_boxes(b[0], c[0], cfg)
            acc = acc + jnp.sum(boxes.xyxy[0])
        if stage >= "c":  # + cloud transform + kNN static branch
            cloud_cam = transform_points(extr.lidar_to_camera, obs.cloud.xyz)
            uvd, uvd_valid = association.project_cloud_to_image(
                obs.cloud.__class__(xyz=cloud_cam,
                                    intensity=obs.cloud.intensity,
                                    count=obs.cloud.count), K)
            depths = association.knn_median_depth(uvd, uvd_valid, boxes,
                                                  cfg.k_near)
            pts = pixel_to_3d(boxes.centers(), depths, intrinsic_inverse(K))
            acc = acc + jnp.sum(pts[0])
        if stage >= "d":  # + crops (no net)
            dyn, _ = pipeline._compact_dynamic(boxes,
                                               cfg.max_orientation_batch)
            crops = preprocess.crop_resize_standardize(
                obs.image, dyn, cfg.network_height)
            acc = acc + jnp.sum(crops[0, 0, 0])
        if stage >= "e":  # + orientation net + multibin
            poses = pipeline._vision_orientation_poses(
                params, obs.image, boxes, K, cfg)
            acc = acc + jnp.sum(poses.position[0])
        if stage >= "f":  # + grid update (full step equivalent)
            lo, occ = rasterize.lshape_update(
                state.log_odds, poses if stage >= "e"
                else LShapePoses.empty(8), cfg)
            new_lo = lo + 0.0 * acc
            return GridState(log_odds=new_lo, occupancy=occ,
                             rng=state.rng, step=state.step + 1)
        # fold acc into state so nothing is DCE'd
        return GridState(log_odds=state.log_odds + 1e-12 * acc,
                         occupancy=state.occupancy, rng=state.rng,
                         step=state.step + 1)

    return stage_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rigs", type=int, default=32)
    ap.add_argument("--scan", type=int, default=4)
    ap.add_argument("--chunks", type=int, default=3)
    ap.add_argument("--stages", default="a,b,c,d,e,f")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    cfg = GridVisionConfig(max_points=8192, compute_dtype="bfloat16")
    eng = pipeline.Engine(cfg, seed=0)

    for stage in args.stages.split(","):
        fn = build_stage(cfg, stage)
        vfn = jax.vmap(fn, in_axes=(None, 0, 0, None))

        @functools.partial(jax.jit, donate_argnums=(1,))
        def chunk(params, states, extr, key, vfn=vfn):
            def body(s, kk):
                obs = jax.vmap(functools.partial(synth_obs, cfg=cfg))(
                    jax.random.split(kk, args.rigs))
                return vfn(params, s, obs, extr), ()
            states, _ = jax.lax.scan(body, states,
                                     jax.random.split(key, args.scan))
            return states

        states = GridState.create_batch(cfg, args.rigs)
        t = time.time()
        states = chunk(eng.params, states, eng.extrinsics,
                       jax.random.PRNGKey(0))
        _ = readback(states.log_odds)
        compile_s = time.time() - t
        t = time.time()
        for c in range(args.chunks):
            states = chunk(eng.params, states, eng.extrinsics,
                           jax.random.PRNGKey(1 + c))
        _ = readback(states.log_odds)
        dt = time.time() - t
        frames = args.rigs * args.scan * args.chunks
        print(f"stage {stage}: compile {compile_s:5.1f}s  "
              f"{dt / frames * 1e3:7.2f} ms/frame  "
              f"({frames / dt:.0f} fps)", flush=True)


if __name__ == "__main__":
    main()
