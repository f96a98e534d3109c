"""Fit YOLOv4-tiny on synthetic scenes:
``python -m grid_vision_tpu.train.fit_synthetic [--steps N]``.

The reference ships pre-trained weight blobs that are unrecoverable, so
this script produces working detector weights from the same synthetic
world the demo/bench use: colored-blob renders of moving traffic with
ground-truth boxes from the scene geometry. Checkpoints land at the
config's detection_weights_file path and are picked up by
models.weights.load_all / the demo's ``--det net`` mode.

NOTE: this is the host-fed CPU-friendly path. The primary trainer is
train/fit_on_device.py (zero host traffic per step, --scene-frames
mixing) — it produced the shipped weights/detector.npz; see
docs/QUALITY.md for the recipe.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def make_batch(scene_cls, cfg, ycfg, rng, batch):
    """Render a batch of scenes + dense anchor targets."""
    import jax.numpy as jnp

    from ..io.scene import SyntheticScene
    from .targets import assign_targets

    images, tb, tc, tp = [], [], [], []
    for _ in range(batch):
        scene = SyntheticScene(cfg, seed=int(rng.integers(2**31)))
        n_obj = int(rng.integers(1, 4))
        for _ in range(n_obj):
            z = rng.uniform(6, 35)
            scene.add_object(
                [rng.uniform(-4, 4), rng.uniform(0.8, 1.4), z],
                [0, 0, 0],
                (rng.uniform(0.6, 2.2), rng.uniform(0.8, 1.6),
                 rng.uniform(0.6, 4.5)),
                int(rng.choice([9, 2, 0, 1, 5, 6])))
        img = scene.image_at(0.0)
        h, w = img.shape[:2]
        gts = []
        for i in range(len(scene.objects)):
            bb = scene.bbox_at(i, 0.0)
            if bb is None:
                continue
            gts.append({
                "x_min": max(bb["x_min"] / w, 0.0),
                "y_min": max(bb["y_min"] / h, 0.0),
                "x_max": min(bb["x_max"] / w, 1.0),
                "y_max": min(bb["y_max"] / h, 1.0),
                "label": bb["label"],
            })
        b, c, p = assign_targets(gts, ycfg)
        # network-input render: bilinear resize to the detector size
        import jax
        net_img = jax.image.resize(
            jnp.asarray(img), (ycfg.input_size, ycfg.input_size, 3),
            "linear") / 255.0
        images.append(net_img)
        tb.append(b)
        tc.append(c)
        tp.append(p)
    return (jnp.stack(images), jnp.asarray(np.stack(tb)),
            jnp.asarray(np.stack(tc)), jnp.asarray(np.stack(tp)))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", default="weights/detector.npz")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--input-size", type=int, default=416)
    args = ap.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import optax

    from ..config import GridVisionConfig
    from ..models.yolov4_tiny import YoloConfig
    from ..utils import checkpoint
    from . import trainer

    cfg = GridVisionConfig(detection_network_input_size=args.input_size)
    ycfg = YoloConfig(input_size=args.input_size)
    tx = optax.adamw(args.lr)
    state = trainer.init_train_state("yolo", ycfg, tx, jax.random.PRNGKey(0))
    step_fn = trainer.make_train_step("yolo", ycfg, tx)

    rng = np.random.default_rng(0)
    t0 = time.time()
    for i in range(args.steps):
        batch = make_batch(None, cfg, ycfg, rng, args.batch)
        state, metrics = step_fn(state, *batch)
        if i % 20 == 0 or i == args.steps - 1:
            print(f"step {i}: loss {float(metrics['loss']):.4f} "
                  f"(box {float(metrics['box_loss']):.3f} "
                  f"obj {float(metrics['obj_loss']):.3f} "
                  f"cls {float(metrics['cls_loss']):.3f}) "
                  f"{time.time() - t0:.0f}s", flush=True)

    checkpoint.save(args.out, state.variables)
    print(f"saved detector weights -> {args.out}")


if __name__ == "__main__":
    main()
