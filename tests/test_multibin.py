"""Golden tests: MultiBin alpha / theta_ray / 64-combo location solver vs
the NumPy oracle (vision_orientation.cpp:241-519)."""

import jax.numpy as jnp
import numpy as np
import pytest

from grid_vision_tpu.config import GridVisionConfig
from grid_vision_tpu.geometry import intrinsic_matrix
from grid_vision_tpu.ops import multibin
from grid_vision_tpu.types import Boxes

from .oracle.reference_oracle import (compute_alpha, compute_theta_ray,
                                      generate_bins, post_process)

CFG = GridVisionConfig()
K = intrinsic_matrix(CFG.fx, CFG.fy, CFG.cx, CFG.cy)
PROJ = np.concatenate([np.asarray(K), np.zeros((3, 1))], axis=1)


def test_bins():
    np.testing.assert_allclose(multibin.ANGLE_BINS_2, generate_bins(2),
                               rtol=1e-6)


def test_alpha_matches_oracle(rng):
    n = 8
    orient = rng.normal(size=(n, 2, 2)).astype(np.float32)
    conf = rng.normal(size=(n, 2)).astype(np.float32)
    got = np.asarray(multibin.compute_alpha(jnp.asarray(orient),
                                            jnp.asarray(conf)))
    bins = generate_bins(2)
    for i in range(n):
        ref = compute_alpha(orient[i].reshape(-1), int(np.argmax(conf[i])),
                            bins)
        np.testing.assert_allclose(got[i], ref, atol=1e-5)


def test_theta_ray_matches_oracle(rng):
    entries = [{"x_min": float(a), "y_min": 100.0,
                "x_max": float(a + 80), "y_max": 220.0}
               for a in rng.uniform(0, 560, size=8)]
    boxes = _make_boxes(entries)
    got = np.asarray(multibin.compute_theta_ray(boxes, CFG.fx,
                                                CFG.camera_image_width))
    for i, e in enumerate(entries):
        ref = compute_theta_ray(e, CFG.fx, CFG.camera_image_width)
        np.testing.assert_allclose(got[i], ref, atol=1e-5)


def _make_boxes(entries, capacity=8, labels=None):
    xyxy = np.zeros((capacity, 4), np.float32)
    label = np.full((capacity,), 10, np.int32)
    valid = np.zeros((capacity,), bool)
    for i, e in enumerate(entries):
        xyxy[i] = [e["x_min"], e["y_min"], e["x_max"], e["y_max"]]
        label[i] = labels[i] if labels else e.get("label", 9)
        valid[i] = True
    return Boxes(xyxy=jnp.asarray(xyxy),
                 confidence=jnp.zeros((capacity,), jnp.float32),
                 label=jnp.asarray(label), valid=jnp.asarray(valid))


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_full_postprocess_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    n = 5
    labels = [9, 2, 0, 1, 9]  # vehicle, person, bike, motorbike, vehicle
    entries = []
    for _ in range(n):
        x0 = rng.uniform(0, 500)
        y0 = rng.uniform(0, 350)
        entries.append({
            "x_min": float(int(x0)), "y_min": float(int(y0)),
            "x_max": float(int(x0 + rng.uniform(40, 140))),
            "y_max": float(int(y0 + rng.uniform(40, 130))),
        })
    for e, l in zip(entries, labels):
        e["label"] = l
    orient = rng.normal(size=(n, 2, 2)).astype(np.float32)
    conf = rng.normal(size=(n, 2)).astype(np.float32)
    dims = rng.normal(0, 0.2, size=(n, 3)).astype(np.float32)

    ref = post_process(orient, conf, dims, entries, PROJ,
                       CFG.camera_image_width)
    assert len(ref) == n  # all labels dynamic

    boxes = _make_boxes(entries, capacity=8, labels=labels)
    got = multibin.multibin_poses(
        jnp.asarray(np.pad(orient, ((0, 3), (0, 0), (0, 0)))),
        jnp.asarray(np.pad(conf, ((0, 3), (0, 0)))),
        jnp.asarray(np.pad(dims, ((0, 3), (0, 0)))),
        boxes, K, CFG)
    gv = np.asarray(got.valid)
    assert gv[:n].all() and not gv[n:].any()
    for i, r in enumerate(ref):
        pos = np.asarray(got.position)[i]
        np.testing.assert_allclose(pos, [r["px"], r["py"], r["pz"]],
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(got.length)[i], r["length"],
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(got.width)[i], r["width"],
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(got.height)[i], r["height"],
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(got.quat)[i], r["quat"],
                                   atol=1e-4)


def test_static_label_masked_out():
    entries = [{"x_min": 100.0, "y_min": 100.0, "x_max": 200.0,
                "y_max": 200.0, "label": 5}]  # traffic light red
    boxes = _make_boxes(entries)
    got = multibin.multibin_poses(
        jnp.zeros((8, 2, 2)), jnp.zeros((8, 2)), jnp.zeros((8, 3)),
        boxes, K, CFG)
    assert not np.asarray(got.valid).any()
