"""Fused Pallas orientation front end vs the XLA chain (interpret mode
on CPU): the kernel math — in-VMEM per-box resize weights, phase-blocked
crop, affine standardization fold, folded-s2d im2col conv — must
reproduce crop_resize -> _standardize -> ConvBN_0 to float rounding,
and the full fleet pose path must be invariant to the backend switch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grid_vision_tpu import pipeline
from grid_vision_tpu.config import GridVisionConfig
from grid_vision_tpu.models import orientation_net
from grid_vision_tpu.ops import pallas_orient, preprocess
from grid_vision_tpu.types import Boxes


def _images(n=3, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.uniform(0, 255, (n, 480, 640, 3)).astype(np.float32))


def _boxes(n=6, seed=1, h=480, w=640):
    """Mixed strip: interior boxes, border-clamped boxes, a degenerate
    sliver, and one invalid slot."""
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, 1, (n, 2)) * [w - 40, h - 40]
    wh = rng.uniform(20, 300, (n, 2))
    xyxy = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    specials = [[-30.0, -20.0, 200.0, 180.0],   # clamps at the origin
                [500.0, 300.0, 700.0, 520.0],   # clamps at the far edge
                [100.2, 100.7, 106.4, 105.1]]   # tiny box, heavy upscale
    for i, row in enumerate(specials[:n]):
        xyxy[i] = row
    valid = np.ones(n, bool)
    valid[-1] = False
    return Boxes(xyxy=jnp.asarray(xyxy),
                 confidence=jnp.asarray(
                     rng.uniform(0.3, 1.0, n).astype(np.float32)),
                 label=jnp.zeros(n, jnp.int32),
                 valid=jnp.asarray(valid))


def _ref_front(variables, image, boxes, size, width, dtype):
    """The production XLA chain the kernel must match: crop_resize ->
    _standardize -> ConvBN_0 (s2d_fold form)."""
    crops = preprocess.crop_resize(image, boxes, size,
                                   compute_dtype=dtype, out_dtype=dtype)
    std = preprocess._standardize(crops, boxes.valid, out_dtype=dtype)
    conv = orientation_net.ConvBN(4 * width, stride=2, dtype=dtype,
                                  s2d_fold=4)
    sub = {"params": variables["params"]["ConvBN_0"],
           "batch_stats": variables["batch_stats"]["ConvBN_0"]}
    return conv.apply(sub, std, False)


@pytest.mark.parametrize("dtype,rtol,atol", [
    (jnp.float32, 2e-3, 2e-3),
    (jnp.bfloat16, 0.06, 0.06),
])
def test_orient_kernel_matches_xla_chain(dtype, rtol, atol):
    size, width = 224, 32
    ocfg = orientation_net.OrientationConfig(width=width, s2d_fold=True,
                                             compute_dtype=dtype,
                                             input_size=size)
    variables = orientation_net.init_params(jax.random.PRNGKey(0), ocfg)
    images = _images()
    boxes = _boxes()
    rig_idx = jnp.asarray([0, 1, 2, 0, 1, 2], jnp.int32)

    ref = []
    for i in range(boxes.xyxy.shape[0]):
        one = jax.tree_util.tree_map(lambda x, i=i: x[i:i + 1], boxes)
        ref.append(_ref_front(variables, images[rig_idx[i]], one,
                              size, width, dtype))
    ref = jnp.concatenate(ref, axis=0)

    consts = pallas_orient.prepare_orient_constants(variables, size,
                                                    width)
    out = pallas_orient.orient_front_pallas(
        images, boxes.xyxy, boxes.valid, rig_idx, consts, size, dtype)
    assert out.shape == (6, size // 8, size // 8, 4 * width)
    # bf16 activations compare in f32; the affine standardization fold
    # changes rounding order, so the tolerance is rounding-scale, and
    # checked RELATIVE to the activation magnitude (post-relu values
    # cluster near 0 where atol dominates).
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=rtol, atol=atol)


def test_orient_kernel_degenerate_crop_finite():
    """A 1x1-source sliver box yields a CONSTANT crop whose per-channel
    variance is pure f32 accumulation noise (~1e-8); the chain then
    normalizes by sqrt of that noise, so its output is rounding-order-
    dependent garbage that no independent implementation can reproduce
    value-for-value. The contract that CAN hold: both paths stay finite
    and bounded (the 1e-6 variance clamp does its job)."""
    size, width = 224, 32
    ocfg = orientation_net.OrientationConfig(width=width, s2d_fold=True,
                                             compute_dtype=jnp.float32,
                                             input_size=size)
    variables = orientation_net.init_params(jax.random.PRNGKey(4), ocfg)
    images = _images(1)
    sliver = Boxes(xyxy=jnp.asarray([[100.0, 100.0, 100.4, 100.4]]),
                   confidence=jnp.ones(1), label=jnp.zeros(1, jnp.int32),
                   valid=jnp.ones(1, bool))
    consts = pallas_orient.prepare_orient_constants(variables, size,
                                                    width)
    out = pallas_orient.orient_front_pallas(
        images, sliver.xyxy, sliver.valid, jnp.zeros(1, jnp.int32),
        consts, size, jnp.float32)
    ref = _ref_front(variables, images[0], sliver, size, width,
                     jnp.float32)
    for a in (out, ref):
        a = np.asarray(a)
        assert np.isfinite(a).all()
        assert np.abs(a).max() < 1e4


def test_orient_kernel_invalid_crop_matches_chain():
    """Invalid crops must produce exactly the chain's relu(BN(0))
    activation (the net still runs on them; multibin drops them)."""
    size, width = 224, 32
    ocfg = orientation_net.OrientationConfig(width=width, s2d_fold=True,
                                             compute_dtype=jnp.float32,
                                             input_size=size)
    variables = orientation_net.init_params(jax.random.PRNGKey(1), ocfg)
    images = _images(1)
    boxes = _boxes(2)
    boxes = Boxes(xyxy=boxes.xyxy, confidence=boxes.confidence,
                  label=boxes.label,
                  valid=jnp.asarray([False, False]))
    consts = pallas_orient.prepare_orient_constants(variables, size,
                                                    width)
    out = pallas_orient.orient_front_pallas(
        images, boxes.xyxy, boxes.valid,
        jnp.zeros(2, jnp.int32), consts, size, jnp.float32)
    ref = _ref_front(variables, images[0], boxes, size, width,
                     jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_stem_external_matches_full_forward():
    """OrientationNetS2D(stem_external=True) on ConvBN_0's output must
    equal the full forward, with an identical parameter tree."""
    ocfg = orientation_net.OrientationConfig(width=32, s2d_fold=True,
                                             compute_dtype=jnp.float32)
    ocfg_ext = orientation_net.OrientationConfig(
        width=32, s2d_fold=True, compute_dtype=jnp.float32,
        stem_external=True)
    variables = orientation_net.init_params(jax.random.PRNGKey(2), ocfg)
    v2 = orientation_net.init_params(jax.random.PRNGKey(2), ocfg_ext)
    assert jax.tree_util.tree_structure(variables) == \
        jax.tree_util.tree_structure(v2)

    rng = np.random.default_rng(3)
    crops = jnp.asarray(rng.normal(0, 1, (4, 224, 224, 3))
                        .astype(np.float32))
    o_ref, c_ref, d_ref = orientation_net.forward(variables, crops, ocfg)
    stem = _ref_front(variables, _images(1)[0], _boxes(4), 224, 32,
                      jnp.float32)
    # feed the REAL stem activation through both tails
    conv = orientation_net.ConvBN(128, stride=2, dtype=jnp.float32,
                                  s2d_fold=4)
    sub = {"params": variables["params"]["ConvBN_0"],
           "batch_stats": variables["batch_stats"]["ConvBN_0"]}
    stem_of_crops = conv.apply(sub, crops, False)
    o_ext, c_ext, d_ext = orientation_net.forward(variables,
                                                  stem_of_crops, ocfg_ext)
    np.testing.assert_allclose(np.asarray(o_ext), np.asarray(o_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_ext), np.asarray(c_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(d_ext), np.asarray(d_ref),
                               rtol=1e-4, atol=1e-4)
    assert stem.shape == stem_of_crops.shape


def test_fleet_poses_backend_invariant():
    """fleet_step's vision poses with orientation_stem_backend='pallas'
    must match the XLA path's poses on the same fleet (f32, where the
    only differences are rounding-order; positions are metric so the
    tolerance is millimetres)."""
    from grid_vision_tpu.models import weights as model_weights
    cfg_x = GridVisionConfig(use_vision_orientation=True,
                             compute_dtype="float32",
                             max_detections=16)
    cfg_p = GridVisionConfig(use_vision_orientation=True,
                             compute_dtype="float32",
                             max_detections=16,
                             orientation_stem_backend="pallas")
    params = model_weights.load_all(cfg_x, seed=0)
    images = _images(2, seed=5)
    boxes1 = _boxes(16, seed=6)
    boxes2 = _boxes(16, seed=7)
    boxes_b = jax.tree_util.tree_map(
        lambda a, b: jnp.stack([a, b]), boxes1, boxes2)
    K = pipeline.intrinsic_matrix(cfg_x.fx, cfg_x.fy, cfg_x.cx, cfg_x.cy)

    poses_x, dropped_x = pipeline._fleet_vision_poses(
        params, images, boxes_b, K, cfg_x, budget=10)
    from grid_vision_tpu.ops import pallas_orient as po
    params_p = dict(params)
    params_p["orientation_stem"] = po.prepare_orient_constants(
        params["orientation"], cfg_p.network_height,
        cfg_p.orientation_width)
    poses_p, dropped_p = pipeline._fleet_vision_poses(
        params_p, images, boxes_b, K, cfg_p, budget=10)

    np.testing.assert_array_equal(np.asarray(dropped_x),
                                  np.asarray(dropped_p))
    np.testing.assert_array_equal(np.asarray(poses_x.valid),
                                  np.asarray(poses_p.valid))
    m = np.asarray(poses_x.valid)
    for name in ("position", "quat", "length", "width", "height"):
        a = np.asarray(getattr(poses_x, name))[m]
        b = np.asarray(getattr(poses_p, name))[m]
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-3,
                                   err_msg=name)
