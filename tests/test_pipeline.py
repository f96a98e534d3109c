"""Integration tests: the fused step / fuse() on synthetic scenes vs the
chained NumPy oracle (the SURVEY §4 'grid agreement' criterion)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grid_vision_tpu import pipeline
from grid_vision_tpu.config import GridVisionConfig
from grid_vision_tpu.geometry import intrinsic_matrix
from grid_vision_tpu.types import (Boxes, Extrinsics, GridState, Obs,
                                   PointCloud)

from .oracle import reference_oracle as oracle

K_NP = np.array([[320.0, 0, 320.0], [0, 320.0, 240.0], [0, 0, 1]], np.float32)

# camera (x right, y down, z fwd) -> base (x fwd, y left, z up)
R_CB = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float32)
T_CB = np.eye(4, dtype=np.float32)
T_CB[:3, :3] = R_CB
EXTR = Extrinsics(lidar_to_camera=jnp.eye(4), camera_to_base=jnp.asarray(T_CB))


def synthetic_scene(rng, cam_height=1.8):
    """Ground plane + a dense car-like cluster at z~12, x~1."""
    n_g = 900
    ground = np.stack([
        rng.uniform(-10, 10, n_g),
        np.full(n_g, cam_height) + rng.normal(0, 0.004, n_g),
        rng.uniform(2, 50, n_g),
    ], 1)
    n_c = 300
    car = np.stack([
        rng.uniform(0.2, 2.0, n_c),
        rng.uniform(0.4, 1.4, n_c),
        rng.uniform(11.0, 14.5, n_c),
    ], 1)
    xyz = np.concatenate([ground, car]).astype(np.float32)
    return xyz, car


def project_bbox(points):
    """Pixel-space bbox covering a camera-frame point set."""
    uv = points @ K_NP.T
    uv = uv[:, :2] / uv[:, 2:3]
    return {
        "x_min": float(np.floor(uv[:, 0].min()) - 2),
        "y_min": float(np.floor(uv[:, 1].min()) - 2),
        "x_max": float(np.ceil(uv[:, 0].max()) + 2),
        "y_max": float(np.ceil(uv[:, 1].max()) + 2),
    }


def make_boxes(entries, capacity=64):
    xyxy = np.zeros((capacity, 4), np.float32)
    conf = np.zeros((capacity,), np.float32)
    label = np.full((capacity,), 10, np.int32)
    valid = np.zeros((capacity,), bool)
    for i, e in enumerate(entries):
        xyxy[i] = [e["x_min"], e["y_min"], e["x_max"], e["y_max"]]
        conf[i] = e.get("confidence", 0.9)
        label[i] = e["label"]
        valid[i] = True
    return Boxes(xyxy=jnp.asarray(xyxy), confidence=jnp.asarray(conf),
                 label=jnp.asarray(label), valid=jnp.asarray(valid))


@pytest.fixture(scope="module")
def pca_engine():
    cfg = GridVisionConfig(use_vision_orientation=False,
                           max_points=2048, compute_dtype="float32")
    # params not needed for fuse() in PCA mode, but build tiny ones anyway
    return cfg


def test_pca_mode_grid_matches_oracle_chain(pca_engine):
    cfg = pca_engine
    rng = np.random.default_rng(42)
    xyz, car = synthetic_scene(rng)
    cloud = PointCloud.from_numpy(xyz, None, cfg.max_points)
    bbox = project_bbox(car)
    bbox["label"] = 9  # VEHICLE
    boxes = make_boxes([bbox], cfg.max_detections)
    obs = Obs(image=jnp.zeros((480, 640, 3)), cloud=cloud,
              has_image=jnp.asarray(True), has_cloud=jnp.asarray(True))
    state = GridState.create(cfg)
    fuse = jax.jit(lambda s, o, b: pipeline.fuse({}, s, o, b, EXTR, cfg))
    new_state, out = fuse(state, obs, boxes)

    # ---- oracle chain ----
    non_ground = xyz[np.abs(xyz[:, 1] - 1.8) > 0.05]  # ideal RANSAC result
    clouds = oracle.extract_cloud_per_bbox(non_ground, K_NP, [bbox], 640, 480)
    filt = oracle.radius_outlier_removal(clouds[0], 0.4, 10)
    pose = oracle.pca_lshape(filt)
    assert pose is not None
    cam_pos = np.array([pose["px"], pose["py"], pose["pz"]])
    base_pos = R_CB @ cam_pos
    g = oracle.GridOracle()
    g.update_lshape([{"px": base_pos[0], "py": base_pos[1],
                      "length": pose["length"], "width": pose["width"]}])

    got_pose = np.asarray(out.poses.position)[0]
    assert bool(np.asarray(out.poses.valid)[0])
    np.testing.assert_allclose(got_pose, base_pos, atol=5e-3)
    np.testing.assert_allclose(np.asarray(new_state.log_odds), g.log_odds,
                               atol=1e-5)
    # grid agreement criterion: occupancy within one int8 step everywhere
    got_i8 = np.asarray(out.occupancy_i8).astype(np.int32)
    ref_i8 = g.export_i8().astype(np.int32)
    assert np.abs(got_i8 - ref_i8).max() <= 1
    assert (got_i8 != ref_i8).mean() < 0.01  # >=99% agreement


def test_static_branch_matches_oracle(pca_engine):
    cfg = pca_engine
    rng = np.random.default_rng(7)
    xyz, car = synthetic_scene(rng)
    cloud = PointCloud.from_numpy(xyz, None, cfg.max_points)
    light = {"x_min": 300.0, "y_min": 100.0, "x_max": 340.0,
             "y_max": 160.0, "label": 5}  # traffic light red
    boxes = make_boxes([light], cfg.max_detections)
    obs = Obs(image=jnp.zeros((480, 640, 3)), cloud=cloud,
              has_image=jnp.asarray(True), has_cloud=jnp.asarray(True))
    state = GridState.create(cfg)
    _, out = jax.jit(
        lambda s, o, b: pipeline.fuse({}, s, o, b, EXTR, cfg))(state, obs,
                                                               boxes)

    img_pts = oracle.build_image_points(xyz, K_NP)
    d = oracle.knn_median_depths(img_pts, [light], k=cfg.k_near)[0]
    cx = light["x_min"] + (light["x_max"] - light["x_min"]) / 2
    cy = light["y_min"] + (light["y_max"] - light["y_min"]) / 2
    cam_pt = oracle.pixel_to_3d(cx, cy, d, np.linalg.inv(K_NP))
    ref_base = R_CB @ cam_pt
    got = np.asarray(out.static_points)[0]
    np.testing.assert_allclose(got, ref_base, rtol=1e-3, atol=1e-3)
    assert bool(np.asarray(out.static_boxes.valid)[0])
    # static-only frame: grid must be decay-only (quirk Q6)
    g = oracle.GridOracle()
    g.update_lshape([])
    np.testing.assert_allclose(np.asarray(out.occupancy_i8), g.export_i8())


def test_gate_both_missing_keeps_state(pca_engine):
    cfg = pca_engine
    state = GridState.create(cfg)
    # pre-decay once so log_odds is not at prior
    state = GridState(log_odds=state.log_odds - 0.4,
                      occupancy=state.occupancy, rng=state.rng,
                      step=state.step)
    obs = Obs.create(cfg)  # both missing
    boxes = make_boxes([], cfg.max_detections)
    new_state, _ = jax.jit(
        lambda s, o, b: pipeline.fuse({}, s, o, b, EXTR, cfg))(state, obs,
                                                               boxes)
    np.testing.assert_array_equal(np.asarray(new_state.log_odds),
                                  np.asarray(state.log_odds))
    assert int(new_state.step) == 1  # step counter still advances


def test_full_step_vision_mode_smoke():
    """End-to-end step() with random-init nets: must run under jit and
    produce a decay-consistent grid when nothing is detected."""
    cfg = GridVisionConfig(max_points=1024, max_candidates=128,
                           max_detections=16)
    eng = pipeline.Engine(cfg, extrinsics=EXTR, seed=0)
    rng = np.random.default_rng(0)
    xyz, _ = synthetic_scene(rng)
    cloud = PointCloud.from_numpy(xyz, None, cfg.max_points)
    img = rng.uniform(0, 255, size=(480, 640, 3)).astype(np.float32)
    obs = Obs(image=jnp.asarray(img), cloud=cloud,
              has_image=jnp.asarray(True), has_cloud=jnp.asarray(True))
    state = eng.init_state()
    state2, out = eng(state, obs)
    assert int(state2.step) == 1
    assert out.occupancy_i8.shape == cfg.grid_size
    lo = np.asarray(state2.log_odds)
    n_boxes = int(np.asarray(out.boxes.count()))
    if n_boxes == 0:
        np.testing.assert_allclose(lo, -0.2, atol=1e-6)
    state3, out3 = eng(state2, obs)
    assert int(state3.step) == 2


def test_q7_orientation_batch_clamped_to_first_eight():
    """Quirk Q7: the reference overflows its TRT buffers beyond 8 dynamic
    boxes; we process the first max_orientation_batch in confidence
    order and drop the rest."""
    from grid_vision_tpu.pipeline import _compact_dynamic

    cap = 16
    xyxy = np.tile(np.asarray([[10, 10, 60, 60]], np.float32), (cap, 1))
    conf = np.linspace(0.99, 0.6, cap).astype(np.float32)
    labels = np.full((cap,), 9, np.int32)   # all dynamic vehicles
    labels[1] = 5                           # one static in second place
    boxes = Boxes(xyxy=jnp.asarray(xyxy), confidence=jnp.asarray(conf),
                  label=jnp.asarray(labels), valid=jnp.ones(cap, bool))
    dyn, order = _compact_dynamic(boxes, 8)
    assert int(np.asarray(dyn.valid).sum()) == 8
    got_conf = np.asarray(dyn.confidence)
    # first 8 dynamic boxes in confidence order (the static one skipped)
    expect = np.concatenate([conf[:1], conf[2:9]])
    np.testing.assert_allclose(got_conf, expect)
    assert (np.asarray(dyn.label) == 9).all()


def test_pca_path_rasterizes_static_boxes_too(pca_engine):
    """The reference's PCA branch passes ALL bboxes to computeBBoxPose
    (grid_vision_node.cpp:215-216), so static objects DO hit the grid in
    that mode (unlike the vision branch) — as long as at least one
    dynamic box exists to enter the branch."""
    cfg = pca_engine
    rng = np.random.default_rng(21)
    xyz, car = synthetic_scene(rng)
    # second dense cluster away from the car: a "traffic light" blob
    light_pts = np.stack([
        rng.uniform(-3.4, -2.6, 250),
        rng.uniform(-1.4, -0.6, 250),
        rng.uniform(19.6, 20.4, 250),
    ], 1).astype(np.float32)
    xyz = np.concatenate([xyz, light_pts])
    cloud = PointCloud.from_numpy(xyz, None, cfg.max_points)

    car_box = project_bbox(car)
    car_box["label"] = 9                     # dynamic
    light_box = project_bbox(light_pts)
    light_box["label"] = 5                   # static (red light)
    boxes = make_boxes([car_box, light_box], cfg.max_detections)
    obs = Obs(image=jnp.zeros((480, 640, 3)), cloud=cloud,
              has_image=jnp.asarray(True), has_cloud=jnp.asarray(True))
    state = GridState.create(cfg)
    fuse = jax.jit(lambda s, o, b: pipeline.fuse({}, s, o, b, EXTR, cfg))
    _, out = fuse(state, obs, boxes)
    valid = np.asarray(out.poses.valid)
    assert valid[0] and valid[1]             # BOTH boxes produced poses
    # and the static object's pose rasterized: its base-frame position is
    # ~ (20, 3) (camera (x=-3, z=20) -> base (20, 3))
    pos = np.asarray(out.poses.position)
    static_pos = pos[1]
    np.testing.assert_allclose(static_pos[0], 20.0, atol=0.5)
    np.testing.assert_allclose(static_pos[1], 3.0, atol=0.5)
