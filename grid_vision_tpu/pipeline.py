"""The fused perception step: one jitted pure function replacing the
reference's ROS node graph.

step(params, state, obs, extrinsics, cfg) -> (state', StepOutput)
reproduces GridVision::timerCallback (src/grid_vision_node.cpp:108-244)
with masks instead of data-dependent branches:

  reference control flow                      | here
  --------------------------------------------|---------------------------
  gate: image && cloud both empty -> return   | run_gate selects old state
    without any grid update (:111-116, Q1)    |   (jnp.where)
  preprocess + ONNX yolo + extract (:120-139) | on-device resize + Flax
                                              |   yolov4-tiny + decode/NMS
  bboxes empty -> decay-only update (:142-148)| masked: zero valid poses
                                              |   rasterize nothing
  filterBBoxes static/dynamic (:153)          | taxonomy.is_dynamic mask
  transformLidarToCamera TF2 (:157)           | static extrinsic matmul
  static: KD-tree kNN median depth +          | brute-force kNN + masked
    pixelTo3D + TF to base (:168-184)         |   backprojection
  dynamic & use_vision_orientation (:190-209) | crop/standardize + Flax
                                              |   MultiBin + 64-combo solve
  dynamic & !use_vision_orientation (:210-231)| RANSAC + frustum assoc +
    NOTE: receives ALL bboxes, not just       |   PCA over ALL boxes
    dynamic ones (:215-216)                   |   (quirk preserved)
  updateMap(grid, poses) / updateMap(grid)    | masked lshape_update
  publish image/grid/markers (:239-243)       | StepOutput arrays

Divergences (documented, graceful where the reference would crash):
  - Q1 corner: with an image missing but a cloud present the reference
    would throw inside cv::resize on the empty Mat; we treat it as "no
    detections" (decay-only), which is the only total semantics.
  - Q7: more than 8 dynamic boxes overflow the reference's TRT buffers
    (undefined behavior); we process the first max_orientation_batch in
    confidence order and drop the rest.
  - RANSAC randomness: deterministic PRNG from state.rng (the reference
    uses rand()).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from .config import GridVisionConfig
from .geometry import (intrinsic_inverse, intrinsic_matrix, pixel_to_3d,
                       transform_points, transform_pose)
from .models import orientation_net, yolov4_tiny
from .ops import association, lshape, multibin, plane, preprocess, rasterize
from .ops.decode import extract_boxes
from .taxonomy import is_dynamic
from .types import (Boxes, Extrinsics, GridState, LShapePoses, Obs,
                    PointCloud, StepOutput)


def detect(params: Dict[str, Any], image: jnp.ndarray,
           cfg: GridVisionConfig) -> Boxes:
    """Image (H, W, 3) [0,255] -> padded pixel-space Boxes (conf desc)."""
    net_in = preprocess.preprocess_detector_image(
        image, cfg.resize,
        compute_dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
        else jnp.float32)
    ycfg = yolov4_tiny.YoloConfig(
        input_size=cfg.resize,
        compute_dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
        else jnp.float32)
    boxes_norm, confs = yolov4_tiny.forward(
        params["detector"], net_in[None], ycfg)
    return extract_boxes(boxes_norm[0], confs[0], cfg)


def _compact_dynamic(boxes: Boxes, capacity: int):
    """First `capacity` dynamic boxes in confidence order (the reference's
    dynamic_bboxes vector, clamped per Q7). Returns (Boxes, take_idx)."""
    dyn = boxes.valid & is_dynamic(boxes.label)
    order = jnp.argsort(~dyn).astype(jnp.int32)[:capacity]  # stable
    sel_valid = dyn[order]
    return Boxes(
        xyxy=boxes.xyxy[order],
        confidence=boxes.confidence[order],
        label=boxes.label[order],
        valid=sel_valid,
    ), order


def _vision_orientation_poses(params, image, boxes: Boxes,
                              K: jnp.ndarray, cfg: GridVisionConfig):
    """The use_vision_orientation=true branch (:190-209), camera frame."""
    dyn_boxes, _ = _compact_dynamic(boxes, cfg.max_orientation_batch)
    crops = preprocess.crop_resize_standardize(
        image, dyn_boxes, cfg.network_height,
        compute_dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
        else jnp.float32)
    ocfg = orientation_net.OrientationConfig(
        input_size=cfg.network_height, width=cfg.orientation_width,
        arch=cfg.orientation_arch,
        compute_dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
        else jnp.float32)
    orient, conf, dims = orientation_net.forward(
        params["orientation"], crops, ocfg)
    return multibin.multibin_poses(orient, conf, dims, dyn_boxes, K, cfg)


def _pca_poses(cloud_cam: jnp.ndarray, cloud_valid: jnp.ndarray,
               boxes: Boxes, K: jnp.ndarray, rng: jnp.ndarray,
               cfg: GridVisionConfig):
    """The use_vision_orientation=false branch: computeBBoxPose over ALL
    boxes (src/grid_vision_node.cpp:215-216 passes `bboxes`), gated on
    the existence of >= 1 dynamic box (:188), camera frame."""
    non_ground, _plane, ok = plane.segment_ground_plane(
        cloud_cam, cloud_valid, rng, cfg.ransac_iters,
        cfg.ransac_distance_threshold)
    assignment, _, _ = association.assign_points_to_boxes(
        cloud_cam, non_ground, K, boxes,
        cfg.camera_image_width, cfg.camera_image_height)
    pts, pvalid, _trunc = association.gather_box_clouds(
        cloud_cam, assignment, boxes.capacity, cfg.max_points_per_box)
    poses = lshape.pca_lshape_poses(
        pts, pvalid, boxes.label, cfg.outlier_radius,
        cfg.outlier_min_neighbors)
    any_dynamic = jnp.any(boxes.valid & is_dynamic(boxes.label))
    return poses.__class__(
        position=poses.position, quat=poses.quat, length=poses.length,
        width=poses.width, height=poses.height, label=poses.label,
        valid=poses.valid & ok & any_dynamic)


def step(params: Dict[str, Any], state: GridState, obs: Obs,
         extrinsics: Extrinsics, cfg: GridVisionConfig):
    """One fused tick. Everything on device; no host sync."""
    boxes = detect(params, obs.image, cfg)
    return fuse(params, state, obs, boxes, extrinsics, cfg)


def fuse(params: Dict[str, Any], state: GridState, obs: Obs, boxes: Boxes,
         extrinsics: Extrinsics, cfg: GridVisionConfig):
    """Everything after 2D detection: association, pose estimation, grid
    update, outputs. Split out so tests/replay can inject known boxes."""
    rng, rng_next = jax.random.split(state.rng)

    boxes = Boxes(xyxy=boxes.xyxy, confidence=boxes.confidence,
                  label=boxes.label, valid=boxes.valid & obs.has_image)
    static_mask = boxes.valid & ~is_dynamic(boxes.label)

    # --- cloud to camera frame (replaces TF2) ---------------------------
    cloud_cam = transform_points(extrinsics.lidar_to_camera, obs.cloud.xyz)
    cloud_valid = obs.cloud.mask() & obs.has_cloud

    K = intrinsic_matrix(cfg.fx, cfg.fy, cfg.cx, cfg.cy)
    K_inv = intrinsic_inverse(K)

    # --- static branch: kNN median depth -> 3D -> base frame ------------
    uvd, uvd_valid = association.project_cloud_to_image(
        PointCloud(xyz=cloud_cam, intensity=obs.cloud.intensity,
                   count=obs.cloud.count), K)
    uvd_valid = uvd_valid & obs.has_cloud
    if cfg.knn_backend == "pallas":
        from .ops.pallas_knn import knn_median_depth_pallas
        depths = knn_median_depth_pallas(uvd, uvd_valid, boxes, cfg.k_near)
    else:
        depths = association.knn_median_depth(uvd, uvd_valid, boxes,
                                              cfg.k_near)
    cam_points = pixel_to_3d(boxes.centers(), depths, K_inv)
    base_points = transform_points(extrinsics.camera_to_base, cam_points)
    static_points = jnp.where(static_mask[:, None], base_points, 0.0)

    # --- dynamic branch: 3D poses (camera frame) ------------------------
    if cfg.use_vision_orientation:
        poses_cam = _vision_orientation_poses(params, obs.image, boxes, K,
                                              cfg)
    else:
        poses_cam = _pca_poses(cloud_cam, cloud_valid, boxes, K, rng, cfg)

    # camera -> base (transformLShapeObjects, :525-531)
    base_pos, base_quat = transform_pose(
        extrinsics.camera_to_base, poses_cam.position, poses_cam.quat)
    poses = LShapePoses(
        position=base_pos, quat=base_quat, length=poses_cam.length,
        width=poses_cam.width, height=poses_cam.height,
        label=poses_cam.label, valid=poses_cam.valid)

    # --- grid update (L1) ------------------------------------------------
    # Masked lshape_update covers all three reference paths: valid poses
    # rasterize; zero valid poses == the decay-only overload. Extension
    # mode additionally carves raycast free space (ops/raycast.py) using
    # the constants the reference declares but never uses (quirk Q2).
    if cfg.raycast_free_space:
        from .ops import raycast
        cloud_base = transform_points(extrinsics.camera_to_base, cloud_cam)
        origin_xy = extrinsics.camera_to_base[:2, 3]
        new_lo, new_occ = raycast.lshape_update_with_carving(
            state.log_odds, poses, origin_xy, cloud_base[:, :2],
            cloud_valid, cfg)
    elif cfg.yaw_aware_rasterization:
        new_lo, new_occ = rasterize.lshape_update_oriented(
            state.log_odds, poses, cfg)
    elif cfg.grid_backend == "pallas":
        from .ops.pallas_grid import lshape_update_pallas
        new_lo, new_occ = lshape_update_pallas(state.log_odds, poses, cfg)
    else:
        new_lo, new_occ = rasterize.lshape_update(state.log_odds, poses,
                                                  cfg)

    # Q1 gate: both inputs missing -> no update at all (not even decay).
    run_gate = obs.has_image | obs.has_cloud
    new_lo = jnp.where(run_gate, new_lo, state.log_odds)
    new_occ = jnp.where(run_gate, new_occ, state.occupancy)

    new_state = GridState(log_odds=new_lo, occupancy=new_occ, rng=rng_next,
                          step=state.step + 1)
    static_boxes = Boxes(xyxy=boxes.xyxy, confidence=boxes.confidence,
                         label=boxes.label, valid=static_mask)
    out = StepOutput(
        boxes=boxes,
        poses=poses,
        static_points=static_points,
        static_boxes=static_boxes,
        occupancy_i8=rasterize.export_occupancy_i8(new_occ),
    )
    return new_state, out


class Engine:
    """Convenience stateful wrapper: owns params/extrinsics/jit cache.

    The functional core stays `pipeline.step`; this is the ergonomic
    replacement for constructing the ROS node (GridVision ctor,
    src/grid_vision_node.cpp:5-77).

    NOTE: the input GridState's buffers are DONATED on each call (the
    grid stays device-resident with no copies). Treat the passed state
    as consumed — keep only the returned state; snapshot via StepOutput
    (occupancy_i8) or copy explicitly before the next call.
    """

    def __init__(self, cfg: GridVisionConfig,
                 extrinsics: Extrinsics | None = None,
                 params: Dict[str, Any] | None = None, seed: int = 0):
        cfg.validate()
        self.cfg = cfg
        self.extrinsics = extrinsics or Extrinsics.identity()
        if params is None:
            from .models import weights
            params = weights.load_all(cfg, seed=seed)
        self.params = params
        self._step = jax.jit(functools.partial(step, cfg=self.cfg),
                             donate_argnums=(1,))

    def init_state(self, seed: int = 0) -> GridState:
        return GridState.create(self.cfg, seed)

    def warmup(self, obs: Obs | None = None) -> None:
        """Ahead-of-time compile of the fused step (the reference's cold
        start loads engines in the ctor; here the analogue is one
        lowering+compile against representative shapes)."""
        if obs is None:
            obs = Obs.create(self.cfg)
        state = self.init_state()
        self._step.lower(self.params, state, obs,
                         self.extrinsics).compile()

    def __call__(self, state: GridState, obs: Obs):
        return self._step(self.params, state, obs, self.extrinsics)
