"""Fused Pallas resize+stem kernel vs the XLA chain (interpret mode on
CPU; the kernel math — constant-weight phase resize, packed im2col
convs, folded BN — must reproduce preprocess_detector_image +
ConvBN_0/1 to float rounding)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from grid_vision_tpu import pipeline
from grid_vision_tpu.config import GridVisionConfig
from grid_vision_tpu.models import yolov4_tiny
from grid_vision_tpu.ops import pallas_stem


def _images(n=2, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.uniform(0, 255, (n, 480, 640, 3)).astype(np.float32))


def test_stem_kernel_matches_xla_chain_f32():
    """Full-detector comparison: resized-input full net vs Pallas stem
    + stem_external net, same params, f32 compute."""
    cfg_ref = yolov4_tiny.YoloConfig(compute_dtype=jnp.float32)
    cfg_ext = yolov4_tiny.YoloConfig(compute_dtype=jnp.float32,
                                     stem_external=True)
    variables = yolov4_tiny.init_params(jax.random.PRNGKey(0), cfg_ref)
    # identical parameter tree with the external-stem form
    v2 = yolov4_tiny.init_params(jax.random.PRNGKey(0), cfg_ext)
    assert jax.tree_util.tree_structure(variables) == \
        jax.tree_util.tree_structure(v2)

    imgs = _images()
    from grid_vision_tpu.ops.preprocess import preprocess_detector_image
    net_in = jax.vmap(functools.partial(
        preprocess_detector_image, size=416,
        compute_dtype=jnp.float32))(imgs)
    b_ref, c_ref = yolov4_tiny.forward(variables, net_in, cfg_ref)

    for fn in (pallas_stem.detector_stem_pallas,
               pallas_stem.detector_stem_im2col_xla):
        stem = fn(imgs, variables, 416, jnp.float32)
        assert stem.shape == (2, 104, 104, 64)
        b_p, c_p = yolov4_tiny.forward(variables, stem, cfg_ext)
        np.testing.assert_allclose(np.asarray(b_p), np.asarray(b_ref),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_ref),
                                   rtol=1e-4, atol=1e-4)

    # the fused CSP-stage kernel on top (detector_stem_backend="pallas2")
    from grid_vision_tpu.ops import pallas_csp
    cfg_front = yolov4_tiny.YoloConfig(compute_dtype=jnp.float32,
                                       front_external=True)
    v3 = yolov4_tiny.init_params(jax.random.PRNGKey(0), cfg_front)
    assert jax.tree_util.tree_structure(variables) == \
        jax.tree_util.tree_structure(v3)
    stem = pallas_stem.detector_stem_pallas(imgs, variables, 416,
                                            jnp.float32)
    stage3 = pallas_csp.detector_csp_pallas(stem, variables, jnp.float32)
    assert stage3.shape == (2, 52, 52, 128)
    b_p, c_p = yolov4_tiny.forward(variables, stage3, cfg_front)
    np.testing.assert_allclose(np.asarray(b_p), np.asarray(b_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_ref),
                               rtol=1e-4, atol=1e-4)

    # the FLAT-layout CSP kernel ("pallas3") computes the same stage;
    # additionally pin it elementwise to the pallas2 kernel's output
    # (identical matmul shapes modulo packing, so near-bitwise in f32)
    stage3_flat = pallas_csp.detector_csp_flat(stem, variables,
                                               jnp.float32)
    assert stage3_flat.shape == (2, 52, 52, 128)
    np.testing.assert_allclose(np.asarray(stage3_flat),
                               np.asarray(stage3), rtol=1e-5, atol=1e-5)
    b_p, c_p = yolov4_tiny.forward(variables, stage3_flat, cfg_front)
    np.testing.assert_allclose(np.asarray(b_p), np.asarray(b_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_ref),
                               rtol=1e-4, atol=1e-4)


def test_vmapped_detect_falls_back_to_xla_stem():
    """jax.vmap(detect) with a pallas stem backend must not lift the
    kernel through vmap (pathological on the tunnel backend) — the
    BatchTracer guard in _detector_input swaps to the XLA stem, so the
    vmapped result equals the plain XLA path exactly."""
    import functools

    base = dict(max_points=512, compute_dtype="float32")
    cfg_p = GridVisionConfig(**base, detector_stem_backend="pallas")
    cfg_x = GridVisionConfig(**base)
    eng = pipeline.Engine(cfg_x, seed=0)
    imgs = _images(3, seed=4) * 0.5
    bv = jax.jit(jax.vmap(functools.partial(pipeline.detect, cfg=cfg_p),
                          in_axes=(None, 0)))(eng.params, imgs)
    bx = jax.jit(jax.vmap(functools.partial(pipeline.detect, cfg=cfg_x),
                          in_axes=(None, 0)))(eng.params, imgs)
    np.testing.assert_array_equal(np.asarray(bv.valid),
                                  np.asarray(bx.valid))
    np.testing.assert_allclose(np.asarray(bv.xyxy), np.asarray(bx.xyxy))


def test_stem_backend_rejects_int8():
    """detector_stem_backend != 'xla' would be silently ignored by the
    int8 detector; validate() must fail loudly instead."""
    import pytest
    with pytest.raises(ValueError, match="float detector"):
        GridVisionConfig(detector_stem_backend="pallas",
                         detector_precision="int8", compat=False).validate()


def test_detect_pallas_stem_backend_matches_xla():
    """Pipeline-level: detect() with detector_stem_backend='pallas'
    finds the same boxes as the XLA path on a rendered scene (shipped
    weights, bf16 fast mode — the production configuration)."""
    from grid_vision_tpu.io.scene import SyntheticScene

    base = dict(max_points=2048, compute_dtype="bfloat16",
                detection_weights_file="weights/detector.npz",
                vision_weights_file="weights/orientation.npz")
    cfg_x = GridVisionConfig(**base)
    cfg_p = GridVisionConfig(**base, detector_stem_backend="pallas")
    eng = pipeline.Engine(cfg_p, seed=0)   # folds + ships stem consts
    assert "detector_stem" in eng.params

    scene = SyntheticScene(cfg_x, seed=3, n_ground=1000)
    scene.add_default_traffic()
    img = jnp.asarray(scene.image_at(0.5))

    bx = jax.jit(functools.partial(pipeline.detect, cfg=cfg_x))(
        eng.params, img)
    bp = jax.jit(functools.partial(pipeline.detect, cfg=cfg_p))(
        eng.params, img)
    vx, vp = np.asarray(bx.valid), np.asarray(bp.valid)
    assert vx.sum() > 0                      # the scene has objects
    assert (vx == vp).mean() > 0.95          # same detections
    both = vx & vp
    np.testing.assert_allclose(np.asarray(bp.xyxy)[both],
                               np.asarray(bx.xyxy)[both],
                               atol=2.0)     # bf16 box-pixel tolerance
    assert (np.asarray(bp.label)[both]
            == np.asarray(bx.label)[both]).all()
