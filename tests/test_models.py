"""Model shape/contract tests: YOLOv4-tiny output contract (2535 anchors,
10 classes, normalized xyxy) and the orientation net's I/O contract."""

import jax
import jax.numpy as jnp
import numpy as np

from grid_vision_tpu.models import orientation_net, yolov4_tiny


def test_yolo_output_contract():
    cfg = yolov4_tiny.YoloConfig(compute_dtype=jnp.float32)
    assert cfg.num_anchors_total == 2535  # 3 * (13^2 + 26^2)
    variables = yolov4_tiny.init_params(jax.random.PRNGKey(0), cfg)
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 416, 416, 3))
    boxes, confs = yolov4_tiny.forward(variables, img, cfg)
    assert boxes.shape == (1, 2535, 4)
    assert confs.shape == (1, 2535, 10)
    b = np.asarray(boxes)
    c = np.asarray(confs)
    # confs are products of sigmoids -> (0, 1)
    assert (c > 0).all() and (c < 1).all()
    # box widths positive; centers roughly in [0, 1]
    assert (b[..., 2] > b[..., 0]).all()
    assert (b[..., 3] > b[..., 1]).all()
    centers = (b[..., :2] + b[..., 2:]) / 2
    assert (centers > -0.1).all() and (centers < 1.1).all()


def test_yolo_head_grid_layout():
    """First 507 rows come from the 13x13 head (3 * 169), anchor-major:
    rows 0..168 anchor 0, etc. Check via the known grid-center layout."""
    cfg = yolov4_tiny.YoloConfig(compute_dtype=jnp.float32)
    h1 = jnp.zeros((1, 13, 13, 45), jnp.float32)
    h2 = jnp.zeros((1, 26, 26, 45), jnp.float32)
    boxes, confs = yolov4_tiny.decode(h1, h2, cfg)
    b = np.asarray(boxes[0])
    # zero logits: sigmoid=0.5 -> bx = (0.5*1.05 - 0.025 + gx)/13
    cx = (b[:169, 0] + b[:169, 2]) / 2
    expect = (0.5 * 1.05 - 0.025 + np.arange(169) % 13) / 13
    np.testing.assert_allclose(cx, expect, atol=1e-6)
    # anchor-major: rows 0..168 all share anchor (81, 82)
    w = b[:169, 2] - b[:169, 0]
    np.testing.assert_allclose(w, 81.0 / 416.0, atol=1e-6)
    # rows 169..337 share anchor (135, 169)
    w2 = b[169:338, 2] - b[169:338, 0]
    np.testing.assert_allclose(w2, 135.0 / 416.0, atol=1e-6)
    # second head starts at 507 with anchor (23, 27), 26-grid
    w3 = b[507:507 + 676, 2] - b[507:507 + 676, 0]
    np.testing.assert_allclose(w3, 23.0 / 416.0, atol=1e-6)


def test_yolo_s2d_stem_is_exact_rearrangement():
    """s2d_stem=True (space-to-depth stem convs) must be the SAME math
    as the canonical 3x3/stride-2 convs — identical parameter tree,
    outputs equal to float rounding (f32 compute: summation order is the
    only difference)."""
    cfg_ref = yolov4_tiny.YoloConfig(compute_dtype=jnp.float32,
                                     s2d_stem=False)
    cfg_s2d = yolov4_tiny.YoloConfig(compute_dtype=jnp.float32,
                                     s2d_stem=True)
    variables = yolov4_tiny.init_params(jax.random.PRNGKey(0), cfg_ref)
    # same parameter tree either way (the 3x3 kernel is the stored form)
    v2 = yolov4_tiny.init_params(jax.random.PRNGKey(0), cfg_s2d)
    assert jax.tree_util.tree_structure(variables) == \
        jax.tree_util.tree_structure(v2)
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 416, 416, 3),
                             jnp.float32, 0.0, 1.0)
    b_ref, c_ref = yolov4_tiny.forward(variables, img, cfg_ref)
    b_s2d, c_s2d = yolov4_tiny.forward(variables, img, cfg_s2d)
    np.testing.assert_allclose(np.asarray(b_s2d), np.asarray(b_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_s2d), np.asarray(c_ref),
                               rtol=1e-5, atol=1e-5)


def test_orientation_s2d_fold_is_exact_rearrangement():
    """s2d_fold=True (the s2d(4)+3x3/s2 stem as one 12x12/s8 conv) must
    be the SAME math — identical parameter tree, outputs equal to float
    rounding (summation order is the only difference)."""
    cfg_ref = orientation_net.OrientationConfig(
        compute_dtype=jnp.float32, s2d_fold=False)
    cfg_fold = orientation_net.OrientationConfig(
        compute_dtype=jnp.float32, s2d_fold=True)
    variables = orientation_net.init_params(jax.random.PRNGKey(0), cfg_ref)
    v2 = orientation_net.init_params(jax.random.PRNGKey(0), cfg_fold)
    assert jax.tree_util.tree_structure(variables) == \
        jax.tree_util.tree_structure(v2)
    crops = jax.random.normal(jax.random.PRNGKey(1), (4, 224, 224, 3))
    o_ref, c_ref, d_ref = orientation_net.forward(variables, crops,
                                                  cfg_ref)
    o_f, c_f, d_f = orientation_net.forward(variables, crops, cfg_fold)
    np.testing.assert_allclose(np.asarray(o_f), np.asarray(o_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(c_f), np.asarray(c_ref),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(d_f), np.asarray(d_ref),
                               rtol=1e-3, atol=1e-3)


def test_orientation_net_contract():
    cfg = orientation_net.OrientationConfig(compute_dtype=jnp.float32)
    variables = orientation_net.init_params(jax.random.PRNGKey(0), cfg)
    crops = jax.random.normal(jax.random.PRNGKey(1), (8, 224, 224, 3))
    orient, conf, dims = orientation_net.forward(variables, crops, cfg)
    assert orient.shape == (8, 2, 2)
    assert conf.shape == (8, 2)
    assert dims.shape == (8, 3)
    # orientation vectors are L2-normalized per bin
    norms = np.linalg.norm(np.asarray(orient), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
