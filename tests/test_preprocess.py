"""Preprocessing tests: detector resize contract + crop/standardize
semantics (vision_orientation.cpp:94-166, quirk Q10)."""

import jax.numpy as jnp
import numpy as np

from grid_vision_tpu.config import GridVisionConfig
from grid_vision_tpu.ops.preprocess import (crop_resize_standardize,
                                            preprocess_detector_image)
from grid_vision_tpu.types import Boxes

CFG = GridVisionConfig()


def make_boxes(entries, capacity=8):
    xyxy = np.zeros((capacity, 4), np.float32)
    valid = np.zeros((capacity,), bool)
    for i, e in enumerate(entries):
        xyxy[i] = e
        valid[i] = True
    return Boxes(xyxy=jnp.asarray(xyxy),
                 confidence=jnp.zeros((capacity,)),
                 label=jnp.full((capacity,), 9, jnp.int32),
                 valid=jnp.asarray(valid))


def test_detector_resize_range_and_shape():
    img = jnp.full((480, 640, 3), 255.0)
    out = preprocess_detector_image(img, 416)
    assert out.shape == (416, 416, 3)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)


def test_detector_resize_identity_when_same_size():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (416, 416, 3)).astype(np.float32)
    out = preprocess_detector_image(jnp.asarray(img), 416)
    np.testing.assert_allclose(np.asarray(out), img / 255.0, atol=1e-5)


def test_detector_resize_matches_jax_image_resize():
    """The constant-weight matmul resize must reproduce
    jax.image.resize('linear') — the function the shipped detector was
    trained against — on the real camera geometry (640x480 -> 416)."""
    import jax

    rng = np.random.default_rng(7)
    img = rng.uniform(0, 255, (480, 640, 3)).astype(np.float32)
    ref = jax.image.resize(jnp.asarray(img), (416, 416, 3),
                           method="linear") / 255.0
    out = preprocess_detector_image(jnp.asarray(img), 416)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_standardize_bf16_single_pass_close_to_f32():
    """The bf16 single-pass moments must agree with the f32 two-pass
    form to within bf16 rounding on realistic pixel crops."""
    from grid_vision_tpu.ops.preprocess import crop_resize_standardize

    rng = np.random.default_rng(8)
    img = rng.uniform(0, 255, (480, 640, 3)).astype(np.float32)
    boxes = make_boxes([[200, 100, 400, 300], [0, 0, 100, 100]])
    ref = np.asarray(crop_resize_standardize(jnp.asarray(img), boxes,
                                             224))
    fast = np.asarray(crop_resize_standardize(
        jnp.asarray(img), boxes, 224,
        compute_dtype=jnp.bfloat16).astype(jnp.float32))
    # crops are standardized (unit scale), so absolute tolerance works
    assert np.abs(fast[:2] - ref[:2]).mean() < 0.02
    assert np.abs(fast[:2] - ref[:2]).max() < 0.3


def test_crop_standardization_stats():
    """Each crop standardized by ITS OWN per-channel stats (Q10)."""
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (480, 640, 3)).astype(np.float32)
    # make channel 0 of the crop region have a big offset
    img[100:300, 200:400, 0] += 500.0
    boxes = make_boxes([[200, 100, 400, 300], [0, 0, 100, 100]])
    crops = np.asarray(crop_resize_standardize(jnp.asarray(img), boxes,
                                               224))
    assert crops.shape == (8, 224, 224, 3)
    for b in range(2):
        for c in range(3):
            ch = crops[b, :, :, c]
            np.testing.assert_allclose(ch.mean(), 0.0, atol=1e-3)
            np.testing.assert_allclose(ch.std(), 1.0, atol=1e-2)
    # invalid boxes -> zero crops
    assert np.abs(crops[2:]).max() == 0.0


def test_crop_clamps_out_of_image_boxes():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 255, (480, 640, 3)).astype(np.float32)
    boxes = make_boxes([[-50, -50, 100, 100], [600, 400, 900, 700]])
    crops = np.asarray(crop_resize_standardize(jnp.asarray(img), boxes,
                                               224))
    assert np.isfinite(crops).all()


def test_constant_crop_guarded():
    """Zero-variance crop: reference divides by ~0 (inf); we guard."""
    img = jnp.full((480, 640, 3), 128.0)
    boxes = make_boxes([[100, 100, 200, 200]])
    crops = np.asarray(crop_resize_standardize(img, boxes, 224))
    assert np.isfinite(crops).all()
    np.testing.assert_allclose(crops[0], 0.0, atol=1e-4)


def test_pipeline_pallas_backend_matches_xla():
    import functools
    import jax
    from grid_vision_tpu import pipeline
    from grid_vision_tpu.demo import default_extrinsics, oracle_boxes
    from grid_vision_tpu.io.scene import SyntheticScene
    from grid_vision_tpu.runtime.stream import obs_from_scene

    base = dict(use_vision_orientation=False, max_points=2048,
                compute_dtype="float32")
    cfg_x = GridVisionConfig(**base, grid_backend="xla")
    cfg_p = GridVisionConfig(**base, grid_backend="pallas")
    eng = pipeline.Engine(cfg_x, extrinsics=default_extrinsics(), seed=0)
    scene = SyntheticScene(cfg_x, seed=0, n_ground=1500)
    scene.add_default_traffic()
    obs = obs_from_scene(scene, 0.0, cfg_x)
    boxes = oracle_boxes(scene, 0.0, cfg_x)
    s0 = eng.init_state()
    fuse_x = jax.jit(functools.partial(pipeline.fuse, cfg=cfg_x))
    fuse_p = jax.jit(functools.partial(pipeline.fuse, cfg=cfg_p))
    sx, _ = fuse_x(eng.params, s0, obs, boxes, eng.extrinsics)
    sp, _ = fuse_p(eng.params, s0, obs, boxes, eng.extrinsics)
    np.testing.assert_array_equal(np.asarray(sx.log_odds),
                                  np.asarray(sp.log_odds))


def test_crop_resize_planar_matches_hwc():
    """The channel-first (3, H, W) fleet pool layout must produce the
    SAME crops as the HWC path — only the einsum operand order differs
    (ops/preprocess.crop_resize planar branch)."""
    from grid_vision_tpu.ops.preprocess import crop_resize

    rng = np.random.default_rng(3)
    img = rng.uniform(0, 255, (48, 64, 3)).astype(np.float32)
    boxes = make_boxes([(4.0, 6.0, 40.0, 30.0), (0.0, 0.0, 63.0, 47.0),
                        (10.5, 3.2, 22.9, 44.1)])
    hwc = crop_resize(jnp.asarray(img), boxes, 16)
    planar = crop_resize(jnp.asarray(img.transpose(2, 0, 1)), boxes, 16)
    assert planar.shape == hwc.shape
    np.testing.assert_allclose(np.asarray(planar), np.asarray(hwc),
                               atol=1e-5, rtol=1e-5)
