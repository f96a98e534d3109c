"""Sensor adapter tests (PointCloud2/Image wire-format parsing)."""

import numpy as np
import pytest

from grid_vision_tpu.io import sensors


def make_pc2(xyz, intensity=None, point_step=16):
    n = xyz.shape[0]
    buf = np.zeros((n, point_step), np.uint8)
    buf[:, 0:12] = xyz.astype(np.float32).view(np.uint8).reshape(n, 12)
    fields = [("x", 0, 7), ("y", 4, 7), ("z", 8, 7)]
    if intensity is not None:
        buf[:, 12:16] = intensity.astype(np.float32).view(
            np.uint8).reshape(n, 4)
        fields.append(("intensity", 12, 7))
    return {"fields": fields, "point_step": point_step, "width": n,
            "height": 1, "data": buf.tobytes()}


def test_pointcloud2_roundtrip(rng):
    xyz = rng.uniform(-10, 10, (20, 3)).astype(np.float32)
    inten = rng.uniform(0, 1, (20,)).astype(np.float32)
    cloud = sensors.pointcloud2_to_cloud(make_pc2(xyz, inten), capacity=64)
    assert int(cloud.count) == 20
    np.testing.assert_allclose(np.asarray(cloud.xyz)[:20], xyz)
    np.testing.assert_allclose(np.asarray(cloud.intensity)[:20], inten)


def test_pointcloud2_with_transform(rng):
    xyz = rng.uniform(-5, 5, (8, 3)).astype(np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [1, 2, 3]
    cloud = sensors.pointcloud2_to_cloud(make_pc2(xyz), capacity=16,
                                         transform=T)
    np.testing.assert_allclose(np.asarray(cloud.xyz)[:8], xyz + [1, 2, 3],
                               rtol=1e-6)


def test_pointcloud2_rejects_bad_layout():
    msg = make_pc2(np.zeros((2, 3), np.float32))
    msg["fields"] = [("x", 0, 7), ("y", 8, 7), ("z", 4, 7)]
    with pytest.raises(ValueError, match="contiguous"):
        sensors.pointcloud2_to_cloud(msg, capacity=8)


def test_image_rgb8_and_bgr8(rng):
    img = rng.integers(0, 255, (4, 6, 3), dtype=np.uint8)
    msg = {"height": 4, "width": 6, "encoding": "rgb8",
           "data": img.tobytes()}
    out = sensors.image_to_array(msg)
    np.testing.assert_array_equal(out, img.astype(np.float32))
    msg["encoding"] = "bgr8"
    out2 = sensors.image_to_array(msg)
    np.testing.assert_array_equal(out2, img[..., ::-1].astype(np.float32))
