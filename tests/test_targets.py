"""Target assignment tests + a short overfit run proving the detector
can learn from the synthetic pipeline end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np

from grid_vision_tpu.models.yolov4_tiny import (ANCHORS, HEAD_MASKS,
                                                YoloConfig, decode)
from grid_vision_tpu.train.targets import assign_targets, head_offsets


def test_assignment_lands_in_correct_cell():
    cfg = YoloConfig(input_size=416)
    # big box -> best anchor is a 13-grid anchor
    gt = {"x_min": 0.3, "y_min": 0.2, "x_max": 0.9, "y_max": 0.9,
          "label": 9}
    tb, tc, tp = assign_targets([gt], cfg)
    rows = np.where(tp > 0)[0]
    assert len(rows) >= 1
    offs = head_offsets(cfg)
    assert offs == [0, 507]
    row = rows[0]
    assert row < 507  # 13-grid head
    a, rem = divmod(row, 169)
    gy, gx = divmod(rem, 13)
    assert gx == int(0.6 * 13)  # center x = 0.6
    assert gy == int(0.55 * 13)
    np.testing.assert_allclose(tb[row], [0.3, 0.2, 0.9, 0.9])
    assert tc[row] == 9


def test_small_box_goes_to_26_grid():
    cfg = YoloConfig(input_size=416)
    gt = {"x_min": 0.50, "y_min": 0.50, "x_max": 0.55, "y_max": 0.56,
          "label": 2}  # ~21x25 px -> anchor (23, 27)
    tb, tc, tp = assign_targets([gt], cfg)
    rows = np.where(tp > 0)[0]
    assert len(rows) == 1
    assert rows[0] >= 507  # 26-grid head only


def test_shared_anchor_3_hits_both_heads():
    """yolov4-tiny's masks share anchor index 3 (81, 82): a box matching
    it trains both heads (darknet semantics)."""
    cfg = YoloConfig(input_size=416)
    w = 81 / 416.0
    h = 82 / 416.0
    gt = {"x_min": 0.5 - w / 2, "y_min": 0.5 - h / 2,
          "x_max": 0.5 + w / 2, "y_max": 0.5 + h / 2, "label": 0}
    _, _, tp = assign_targets([gt], cfg)
    rows = np.where(tp > 0)[0]
    assert len(rows) == 2
    assert (rows < 507).sum() == 1 and (rows >= 507).sum() == 1


def test_overfit_single_batch():
    """A few SGD steps on one tiny batch must drive the loss down and
    move the predicted box toward the target (learning actually works
    through decode + loss)."""
    import optax
    from grid_vision_tpu.train import trainer

    cfg = YoloConfig(input_size=64, compute_dtype=jnp.float32)
    tx = optax.adam(3e-3)
    state = trainer.init_train_state("yolo", cfg, tx, jax.random.PRNGKey(0))
    step_fn = trainer.make_train_step("yolo", cfg, tx)

    gt = {"x_min": 0.25, "y_min": 0.25, "x_max": 0.75, "y_max": 0.75,
          "label": 9}
    tb, tc, tp = assign_targets([gt], cfg)
    images = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    batch = (images, jnp.asarray(tb)[None].repeat(2, 0),
             jnp.asarray(tc)[None].repeat(2, 0),
             jnp.asarray(tp)[None].repeat(2, 0))
    losses = []
    for _ in range(30):
        state, metrics = step_fn(state, *batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses[::10]
