"""On-TPU MultiBin orientation training:
``python -m grid_vision_tpu.train.fit_orientation``.

Synthetic oriented-object crops rendered on device: a rotated rectangle
with a brightness gradient along its heading encodes the observation
angle alpha; the net learns the MultiBin decomposition (bin confidence +
per-bin cos/sin offset). Dimension targets are zero residuals (the
class-average fallback — the honest target when the synthetic crop
carries no metric size cue). Produces working weights for the engine's
use_vision_orientation path.

The MultiBin target convention matches ops/multibin.compute_alpha:
alpha = atan2(sin, cos) + bin_center - pi, so the trained offset for a
bin is delta = wrap(alpha + pi - bin_center).
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def build_scene_crop_dataset(n_crops: int, size: int, seed: int = 4000):
    """Metric crops from the scene renderer (io/scene.py): the replay
    world's dynamic objects cropped through the PRODUCTION preprocessing
    (ops/preprocess.crop_resize_standardize — interpolation matmuls +
    per-crop standardization, Q10), each labeled with its TRUE dims
    residual (length, width, height) - class average
    (taxonomy.AVG_DIMS_LUT, the MultiBin anchor the reference applies at
    vision_orientation.cpp:472-495). Trains the dimension head on
    metrically meaningful targets; the synthetic oriented crops keep
    training the angle heads (they carry no size cue — a standardized
    crop is scale-invariant).

    Returns (crops (N, size, size, 3) f32, dims_residual (N, 3) f32,
    labels (N,) i32)."""
    import jax
    import jax.numpy as jnp

    from ..config import GridVisionConfig
    from ..io.scene import SyntheticScene
    from ..ops import preprocess
    from ..taxonomy import AVG_DIMS_LUT, DYNAMIC_LUT
    from ..types import Boxes

    cfg = GridVisionConfig()
    rng = np.random.default_rng(seed)
    crop_fn = jax.jit(
        lambda img, bx: preprocess.crop_resize_standardize(img, bx, size))
    crops = np.empty((n_crops, size, size, 3), np.float32)
    tgts = np.empty((n_crops, 3), np.float32)
    labels = np.empty((n_crops,), np.int32)
    i = s = 0
    w, h = cfg.camera_image_width, cfg.camera_image_height
    while i < n_crops:
        scene = SyntheticScene(cfg, seed=seed + s)
        s += 1
        scene.add_default_traffic()
        scene.add_random_traffic(rng, n_dynamic=3, n_static=0)
        t = float(rng.uniform(0.0, 2.5))
        img = jnp.asarray(scene.image_at(t), jnp.float32)
        for j, obj in enumerate(scene.objects):
            if i >= n_crops:
                break
            if not DYNAMIC_LUT[min(obj.label, 10)]:
                continue
            bb = scene.bbox_at(j, t)
            if bb is None:
                continue
            x0, y0 = max(0.0, bb["x_min"]), max(0.0, bb["y_min"])
            x1 = min(float(w), bb["x_max"])
            y1 = min(float(h), bb["y_max"])
            if x1 - x0 < 8.0 or y1 - y0 < 8.0:
                continue
            boxes = Boxes(
                xyxy=jnp.asarray([[x0, y0, x1, y1]], jnp.float32),
                confidence=jnp.ones((1,), jnp.float32),
                label=jnp.asarray([obj.label], jnp.int32),
                valid=jnp.ones((1,), bool))
            crops[i] = np.asarray(crop_fn(img, boxes))[0]
            wx, hy, dz = obj.size      # camera-frame extents
            # LShapePose convention: length along heading (z), width
            # across (x), height vertical (y)
            tgts[i] = (np.asarray([dz, wx, hy], np.float32)
                       - AVG_DIMS_LUT[obj.label])
            labels[i] = obj.label
            i += 1
    return crops, tgts, labels


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--scan", type=int, default=50)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", default="weights/orientation.npz")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--input-size", type=int, default=224)
    ap.add_argument("--width", type=int, default=32)
    ap.add_argument("--arch", default="s2d", choices=("s2d", "resnet"))
    ap.add_argument("--scene-crops", type=int, default=0,
                    help="mix in N metric crops from the scene renderer "
                         "(trains the dimension head on true dims "
                         "residuals; uploaded once)")
    ap.add_argument("--scene-frac", type=float, default=0.375,
                    help="fraction of each batch drawn from the metric "
                         "scene crops")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import optax

    from ..models.orientation_net import OrientationConfig
    from ..ops.multibin import ANGLE_BINS_2
    from ..utils import checkpoint
    from . import trainer

    size = args.input_size
    bins = jnp.asarray(ANGLE_BINS_2)

    def render_crop(key):
        """One standardized crop + (alpha, tgt_bin, tgt_offset)."""
        k_a, k_ab, k_cls, k_noise = jax.random.split(key, 4)
        alpha = jax.random.uniform(k_a, (), minval=-jnp.pi, maxval=jnp.pi)
        half = jax.random.uniform(k_ab, (2,), minval=0.15, maxval=0.45)
        cls_shade = jax.random.uniform(k_cls, (3,), minval=0.3, maxval=1.0)

        yy = (jax.lax.broadcasted_iota(jnp.float32, (size, size), 0)
              / size - 0.5) * 2.0
        xx = (jax.lax.broadcasted_iota(jnp.float32, (size, size), 1)
              / size - 0.5) * 2.0
        c, s = jnp.cos(alpha), jnp.sin(alpha)
        u = c * xx + s * yy          # along heading
        v = -s * xx + c * yy
        inside = (jnp.abs(u) < half[0]) & (jnp.abs(v) < half[1])
        grad = (u / half[0] + 1.0) / 2.0   # bright toward the heading
        img = jnp.where(inside[..., None],
                        (0.3 + 0.7 * grad)[..., None] * cls_shade, 0.1)
        img = img + jax.random.normal(k_noise, img.shape) * 0.02
        # per-crop standardization (the production preprocessing, Q10)
        mean = jnp.mean(img, axis=(0, 1), keepdims=True)
        std = jnp.sqrt(jnp.mean((img - mean) ** 2, axis=(0, 1),
                                keepdims=True))
        crop = (img - mean) / jnp.maximum(std, 1e-6)

        delta = jnp.mod(alpha + jnp.pi - bins + jnp.pi,
                        2.0 * jnp.pi) - jnp.pi          # per-bin offset
        tgt_bin = jnp.argmin(jnp.abs(delta))
        return crop, tgt_bin.astype(jnp.int32), delta[tgt_bin]

    ocfg = OrientationConfig(input_size=size, width=args.width,
                             arch=args.arch)
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=min(100, args.steps // 5),
        decay_steps=args.steps)
    tx = optax.adamw(schedule, weight_decay=1e-5)
    state = trainer.init_train_state("multibin", ocfg, tx,
                                     jax.random.PRNGKey(0))
    step_fn = trainer.make_train_step("multibin", ocfg, tx)

    b_scene = (int(round(args.batch * args.scene_frac))
               if args.scene_crops else 0)
    b_synth = args.batch - b_scene
    if b_scene:
        print(f"rendering {args.scene_crops} metric scene crops...",
              flush=True)
        sc_crops, sc_dims, _lbl = build_scene_crop_dataset(
            args.scene_crops, size)
        # jit ARGUMENTS, not closure constants (CLAUDE.md: big closure
        # constants wedge tunnel-attached compilation)
        ds = (jnp.asarray(sc_crops), jnp.asarray(sc_dims))

    @jax.jit
    def run_chunk(state, key, *ds_args):
        def body(s, kk):
            k1, k2 = jax.random.split(kk)
            crops, tgt_bin, tgt_off = jax.vmap(render_crop)(
                jax.random.split(k1, b_synth))
            tgt_dims = jnp.zeros((b_synth, 3))
            if b_scene:
                # synth crops: angle signal only (no metric size cue);
                # scene crops: dims signal only (degenerate yaw)
                idx = jax.random.randint(k2, (b_scene,), 0,
                                         args.scene_crops)
                crops = jnp.concatenate([crops, ds_args[0][idx]])
                tgt_dims = jnp.concatenate([tgt_dims, ds_args[1][idx]])
                tgt_bin = jnp.concatenate(
                    [tgt_bin, jnp.zeros((b_scene,), jnp.int32)])
                tgt_off = jnp.concatenate(
                    [tgt_off, jnp.zeros((b_scene,))])
                dim_w = jnp.concatenate(
                    [jnp.zeros(b_synth), jnp.ones(b_scene)])
                ang_w = jnp.concatenate(
                    [jnp.ones(b_synth), jnp.zeros(b_scene)])
                s2, metrics = step_fn(s, crops, tgt_dims, tgt_bin,
                                      tgt_off, dim_w, ang_w)
            else:
                s2, metrics = step_fn(s, crops, tgt_dims, tgt_bin,
                                      tgt_off)
            return s2, metrics["loss"]
        return jax.lax.scan(body, state,
                            jax.random.split(key, args.scan))

    ds_args = ds if b_scene else ()
    t0 = time.time()
    for c in range(max(args.steps // args.scan, 1)):
        state, losses = run_chunk(state, jax.random.PRNGKey(2000 + c),
                                  *ds_args)
        losses = np.asarray(losses)
        print(f"steps {c * args.scan}-{(c + 1) * args.scan - 1}: "
              f"loss {losses[0]:.4f} -> {losses[-1]:.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    checkpoint.save(args.out, state.variables)
    print(f"saved orientation weights -> {args.out}")

    # quick angle-recovery eval on fresh crops
    from ..models import orientation_net
    from ..ops import multibin
    crops, tgt_bin, tgt_off = jax.vmap(render_crop)(
        jax.random.split(jax.random.PRNGKey(9999), 64))
    orient, conf, dims = orientation_net.forward(state.variables, crops,
                                                 ocfg)
    alpha_hat = multibin.compute_alpha(orient, conf)
    alpha_true = np.asarray(
        jnp.mod(jnp.asarray(ANGLE_BINS_2)[tgt_bin] - jnp.pi + tgt_off
                + jnp.pi, 2 * jnp.pi) - jnp.pi)
    err = np.abs(np.angle(np.exp(1j * (np.asarray(alpha_hat)
                                       - alpha_true))))
    print(f"angle recovery: median {np.degrees(np.median(err)):.1f} deg, "
          f"90pct {np.degrees(np.percentile(err, 90)):.1f} deg")

    if b_scene:
        # held-out metric-crop dims recovery (fresh seed stream)
        hc, hd, _ = build_scene_crop_dataset(64, size, seed=9_100_000)
        _, _, dims_hat = orientation_net.forward(
            state.variables, jnp.asarray(hc), ocfg)
        derr = np.abs(np.asarray(dims_hat) - hd)
        print(f"dims recovery: median |err| {np.median(derr):.3f} m, "
              f"90pct {np.percentile(derr, 90):.3f} m")


if __name__ == "__main__":
    main()
