"""int8 detector path (models/yolov4_int8): BN-fold + quantization
correctness and end-to-end quality parity with the float path."""

import jax
import jax.numpy as jnp
import numpy as np

from grid_vision_tpu.config import GridVisionConfig
from grid_vision_tpu.models import weights as weights_mod
from grid_vision_tpu.models import yolov4_int8, yolov4_tiny

REPO = __file__.rsplit("/tests/", 1)[0]


def _params():
    cfg = GridVisionConfig(
        detection_weights_file="/weights/detector.npz")
    return weights_mod.load_all(cfg, base_dir=REPO)


def test_quantized_forward_close_to_float():
    params = _params()
    q = yolov4_int8.quantize_detector(params["detector"])
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (2, 416, 416, 3))
                      .astype(np.float32))
    bf, cf = yolov4_tiny.forward(
        params["detector"], img,
        yolov4_tiny.YoloConfig(compute_dtype=jnp.float32))
    bi, ci = yolov4_int8.forward_int8(q, img)
    assert float(jnp.mean(jnp.abs(bf - bi))) < 5e-3
    assert float(jnp.mean(jnp.abs(cf - ci))) < 1e-2
    # the detection-relevant tail must agree: same count of confident
    # anchors within a small margin
    n_f = int((cf > 0.5).sum())
    n_i = int((ci > 0.5).sum())
    assert abs(n_f - n_i) <= max(10, n_f // 20), (n_f, n_i)


def test_int8_map_within_float():
    from grid_vision_tpu.train.eval_map import evaluate_detector
    import dataclasses
    cfg_f = GridVisionConfig(
        detection_weights_file="/weights/detector.npz")
    params = weights_mod.load_all(cfg_f, base_dir=REPO)
    cfg_i = dataclasses.replace(cfg_f, detector_precision="int8",
                                compat=False)
    params["detector_q"] = yolov4_int8.quantize_detector(
        params["detector"])
    r_f = evaluate_detector(params, cfg_f, n_images=4, source="synth")
    r_i = evaluate_detector(params, cfg_i, n_images=4, source="synth")
    assert r_i.map50 >= r_f.map50 - 0.03, (r_f.map50, r_i.map50)


def test_config_knob():
    import pytest
    with pytest.raises(ValueError):
        GridVisionConfig(detector_precision="fp4").validate()
    # int8 is an extension knob: gated behind compat=False like the
    # other reference-deviating extensions (ADVICE r2).
    with pytest.raises(ValueError):
        GridVisionConfig(detector_precision="int8").validate()
    GridVisionConfig(detector_precision="int8", compat=False).validate()


def test_static_scales_match_dynamic_quality():
    """Static calibrated activation scales (the semantics a fused
    Pallas int8 ladder implements — no data-dependent scale reductions
    in the chain) track the dynamic-scale twin closely on held-out
    images."""
    params = _params()
    q = yolov4_int8.quantize_detector(params["detector"])
    rng = np.random.default_rng(1)
    calib = [jnp.asarray(rng.uniform(0, 1, (2, 416, 416, 3))
                         .astype(np.float32)) for _ in range(2)]
    scales = yolov4_int8.calibrate_scales(q, calib)
    assert set(scales) == {
        "ConvBN_0", "ConvBN_1", "ConvBN_2", "ConvBN_3", "ConvBN_4",
        "ConvBN_5", "ConvBN_6", "ConvBN_7", "ConvBN_8", "ConvBN_9",
        "CSPBlock_0/ConvBN_0", "CSPBlock_0/ConvBN_1",
        "CSPBlock_0/ConvBN_2", "CSPBlock_1/ConvBN_0",
        "CSPBlock_1/ConvBN_1", "CSPBlock_1/ConvBN_2",
        "CSPBlock_2/ConvBN_0", "CSPBlock_2/ConvBN_1",
        "CSPBlock_2/ConvBN_2"}
    img = jnp.asarray(rng.uniform(0, 1, (2, 416, 416, 3))
                      .astype(np.float32))
    bd, cd = yolov4_int8.forward_int8(q, img)
    bs, cs = yolov4_int8.forward_int8_static(q, scales, img)
    assert float(jnp.mean(jnp.abs(bd - bs))) < 5e-3
    assert float(jnp.mean(jnp.abs(cd - cs))) < 1e-2
