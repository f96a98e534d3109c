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

    @jax.jit
    def run_chunk(state, key):
        def body(s, kk):
            crops, tgt_bin, tgt_off = jax.vmap(render_crop)(
                jax.random.split(kk, args.batch))
            tgt_dims = jnp.zeros((args.batch, 3))
            s2, metrics = step_fn(s, crops, tgt_dims, tgt_bin, tgt_off)
            return s2, metrics["loss"]
        return jax.lax.scan(body, state,
                            jax.random.split(key, args.scan))

    t0 = time.time()
    for c in range(max(args.steps // args.scan, 1)):
        state, losses = run_chunk(state, jax.random.PRNGKey(2000 + c))
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


if __name__ == "__main__":
    main()
