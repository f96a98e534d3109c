"""Bisect WHERE the pallas orientation kernel diverges on real TPU.

tools/orient_hw_check.py proved the kernel's hardware output is wrong
(max |diff| ~554 vs activation max ~4.5) while interpret mode matches
the XLA chain to rounding. This taps each kernel stage (debug_stage in
ops/pallas_orient.py) and compares TPU vs the CPU-interpret ground
truth, so the first diverging stage names the broken Mosaic construct:

    crop    resize matmuls + in-VMEM weight build
    stats   single-pass f32 moments (mean / inv-std)
    planes  standardized phase-plane scratch stores
    i2c     tap slices + the scratch reshape VIEW
    (full)  + the big matmul and BN/relu epilogue

Usage: run ONCE on hardware (writes /tmp/orient_bisect_tpu.json), the
tool loads the interpret-mode reference it computes inline on CPU via
a subprocess — or pass --stage to probe one stage.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys

import numpy as np

sys.path.insert(0, ".")

STAGES = ["crop", "stats", "planes", "i2c", "full"]


def compute(stage: str, cpu: bool):
    import jax
    if cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from grid_vision_tpu.models import orientation_net
    from grid_vision_tpu.ops import pallas_orient
    from grid_vision_tpu.types import Boxes

    size, width = 224, 32
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.uniform(0, 255, (3, 480, 640, 3)).astype(np.float32))
    h, w = 480, 640
    xy = rng.uniform(0, 1, (6, 2)) * [w - 40, h - 40]
    wh = rng.uniform(20, 300, (6, 2))
    xyxy = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    xyxy[0] = [-30.0, -20.0, 200.0, 180.0]
    xyxy[1] = [500.0, 300.0, 700.0, 520.0]
    xyxy[2] = [100.2, 100.7, 106.4, 105.1]
    valid = np.ones(6, bool)
    valid[-1] = False
    boxes = Boxes(xyxy=jnp.asarray(xyxy), confidence=jnp.ones(6),
                  label=jnp.zeros(6, jnp.int32),
                  valid=jnp.asarray(valid))
    rig_idx = jnp.asarray([0, 1, 2, 0, 1, 2], jnp.int32)
    ocfg = orientation_net.OrientationConfig(
        width=width, s2d_fold=True, compute_dtype=jnp.float32,
        input_size=size)
    variables = orientation_net.init_params(jax.random.PRNGKey(0), ocfg)
    consts = pallas_orient.prepare_orient_constants(variables, size,
                                                    width)
    out = pallas_orient.orient_front_pallas(
        images, boxes.xyxy, boxes.valid, rig_idx, consts, size,
        jnp.float32, debug_stage=None if stage == "full" else stage)
    return np.asarray(out, np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default=None,
                    help="one stage; default runs all")
    ap.add_argument("--inner-cpu", action="store_true",
                    help="(internal) emit one stage to stdout as npy")
    args = ap.parse_args()

    if args.inner_cpu:
        arr = compute(args.stage, cpu=True)
        np.save(sys.stdout.buffer, arr)
        return

    stages = [args.stage] if args.stage else STAGES
    report = {}
    for st in stages:
        tpu = compute(st, cpu=False)
        # interpret-mode ground truth in a clean interpreter (this one
        # already initialized the TPU backend)
        p = subprocess.run(
            [sys.executable, __file__, "--stage", st, "--inner-cpu"],
            capture_output=True, check=True)
        import io
        ref = np.load(io.BytesIO(p.stdout))
        d = np.abs(tpu - ref)
        rep = {"max_abs_diff": float(d.max()),
               "mean_abs_diff": float(d.mean()),
               "ref_absmax": float(np.abs(ref).max()),
               "per_box": [float(d[i].max()) for i in range(d.shape[0])]}
        report[st] = rep
        print(st, json.dumps(rep), flush=True)
    with open("/tmp/orient_bisect_tpu.json", "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
