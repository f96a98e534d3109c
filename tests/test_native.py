"""Native runtime tests: mailboxes, cloud packing, C++ grid oracle
cross-check against both the NumPy oracle and the XLA rasterizer."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from grid_vision_tpu.config import GridVisionConfig
from grid_vision_tpu.ops import rasterize
from grid_vision_tpu.runtime import native
from grid_vision_tpu.types import GridState, LShapePoses

from .oracle.reference_oracle import GridOracle

CFG = GridVisionConfig()

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native lib unavailable")


def test_mailbox_latest_wins():
    mb = native.Mailbox()
    assert mb.read() is None
    mb.write(b"frame-1", stamp_ns=100)
    mb.write(b"frame-2", stamp_ns=200)
    data, stamp = mb.read()
    assert data == b"frame-2"
    assert stamp == 200
    assert mb.seq == 2


def make_blob(xyz, intensity, stride=16):
    n = xyz.shape[0]
    blob = np.zeros((n, stride), np.uint8)
    blob[:, 0:12] = xyz.astype(np.float32).view(np.uint8).reshape(n, 12)
    blob[:, 12:16] = intensity.astype(np.float32).view(np.uint8).reshape(n, 4)
    return blob.tobytes()


@pytest.mark.parametrize("capacity", [32, 8])
def test_pack_cloud(rng, capacity):
    n = 16
    xyz = rng.uniform(-10, 10, size=(n, 3)).astype(np.float32)
    xyz[3] = [np.nan, 1, 2]
    xyz[7, 2] = np.inf
    inten = rng.uniform(0, 1, size=(n,)).astype(np.float32)
    blob = make_blob(xyz, inten)
    out_xyz, out_int, count = native.pack_cloud(blob, n, 16, 0, 12, capacity)

    finite = np.isfinite(xyz).all(axis=1)
    expect = xyz[finite][:capacity]
    assert count == len(expect)
    np.testing.assert_allclose(out_xyz[:count], expect)
    np.testing.assert_allclose(out_int[:count], inten[finite][:capacity])
    assert (out_xyz[count:] == native.PAD_SENTINEL).all()


def test_pack_cloud_with_transform(rng):
    n = 8
    xyz = rng.uniform(-5, 5, size=(n, 3)).astype(np.float32)
    inten = np.zeros((n,), np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]])
    T[:3, 3] = [1, 2, 3]
    blob = make_blob(xyz, inten)
    out_xyz, _, count = native.pack_cloud(blob, n, 16, 0, 12, 16,
                                          transform=T)
    expect = xyz @ T[:3, :3].T + T[:3, 3]
    np.testing.assert_allclose(out_xyz[:count], expect, rtol=1e-6)


@needs_native
def test_native_grid_oracle_matches_numpy_oracle(rng):
    py_oracle = GridOracle()
    lo = np.full(CFG.grid_size, 0.0, np.float32)
    for _ in range(3):
        n = int(rng.integers(0, 5))
        boxes = []
        for _ in range(n):
            boxes.append({"px": float(rng.uniform(-12, 45)),
                          "py": float(rng.uniform(-12, 12)),
                          "length": float(rng.uniform(0.3, 5)),
                          "width": float(rng.uniform(0.3, 3))})
        py_oracle.update_lshape(boxes)
        arr = np.array([[b["px"], b["py"], b["length"], b["width"]]
                        for b in boxes], np.float32).reshape(-1, 4)
        lo, occ = native.grid_update_native(
            lo, arr, center=CFG.grid_center,
            length=(CFG.grid_x, CFG.grid_y), resolution=CFG.resolution,
            decay=CFG.log_odds_decay, hit=CFG.log_odds_hit,
            lo_min=CFG.min_log_odds, lo_max=CFG.max_log_odds)
    np.testing.assert_allclose(lo, py_oracle.log_odds, atol=1e-5)
    np.testing.assert_allclose(occ, py_oracle.occupancy, atol=1e-6)


@needs_native
def test_native_grid_matches_xla_rasterizer():
    """Three-way agreement: C++ native == XLA == NumPy oracle."""
    state = GridState.create(CFG)
    poses = LShapePoses.empty(4)
    poses = LShapePoses(
        position=poses.position.at[0].set(jnp.asarray([16.0, 0.0, 0.0])),
        quat=poses.quat, length=poses.length.at[0].set(3.0),
        width=poses.width.at[0].set(1.5), height=poses.height,
        label=poses.label, valid=poses.valid.at[0].set(True))
    xla_lo, xla_occ = rasterize.lshape_update(state.log_odds, poses, CFG)
    nat_lo, nat_occ = native.grid_update_native(
        np.zeros(CFG.grid_size, np.float32),
        np.asarray([[16.0, 0.0, 3.0, 1.5]], np.float32),
        center=CFG.grid_center, length=(CFG.grid_x, CFG.grid_y),
        resolution=CFG.resolution, decay=CFG.log_odds_decay,
        hit=CFG.log_odds_hit, lo_min=CFG.min_log_odds,
        lo_max=CFG.max_log_odds)
    np.testing.assert_allclose(np.asarray(xla_lo), nat_lo, atol=1e-5)
    np.testing.assert_allclose(np.asarray(xla_occ), nat_occ, atol=1e-6)


def test_write_pgm(tmp_path):
    grid = np.zeros((20, 10), np.int8)
    grid[5:10, 2:5] = 100
    path = os.path.join(tmp_path, "grid.pgm")
    native.write_pgm(path, grid)
    with open(path, "rb") as f:
        header = f.readline()
        dims = f.readline()
        _maxval = f.readline()
        data = f.read()
    assert header.strip() == b"P5"
    assert dims.strip() == b"10 20"
    px = np.frombuffer(data, np.uint8).reshape(20, 10)
    assert px[7, 3] == 0       # occupied -> dark
    assert px[0, 0] == 255     # free -> white
