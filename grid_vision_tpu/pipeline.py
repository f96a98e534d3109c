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
                    PointCloud, SaturationStats, StepOutput)


def _detector_forward(params, net_in, ycfg, cfg: GridVisionConfig):
    """Dispatch float vs int8 detector (cfg.detector_precision; the int8
    twin consumes pre-quantized params["detector_q"], prepared by
    models.weights.load_all / Engine init)."""
    if cfg.detector_precision == "int8":
        from .models import yolov4_int8
        return yolov4_int8.forward_int8(params["detector_q"], net_in,
                                        ycfg)
    return yolov4_tiny.forward(params["detector"], net_in, ycfg)


def _detector_input(params, images: jnp.ndarray, cfg: GridVisionConfig):
    """(R, H, W, 3) [0,255] frames -> (net_in, ycfg) for the detector.

    detector_stem_backend="pallas" (float detector only) feeds the net
    its stage-2 activation from the fused resize+stem kernel
    (ops/pallas_stem.py) with stem_external=True; otherwise the resized
    frames run the full net. The folded stem constants ride in
    params["detector_stem"] when the Engine prepared them (falling back
    to an in-graph fold for direct callers).

    Accepts channel-first PLANAR frames (R, 3, H, W) as well as HWC —
    the fleet fast-path pool layout (the Pallas stem consumes planar
    natively; every other backend transposes back to HWC here)."""
    dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
             else jnp.float32)
    planar = images.ndim == 4 and images.shape[-1] != 3
    backend = cfg.detector_stem_backend
    if backend in ("pallas", "pallas2", "pallas3"):
        try:
            from jax._src.interpreters.batching import BatchTracer
            batched = isinstance(images, BatchTracer)
        except ImportError:    # jax moved it; fall back to duck-typing
            batched = any(t.__name__ == "BatchTracer"
                          for t in type(images).__mro__)
        if batched:
            # a vmapped pallas_call gains a sequential batch grid and
            # measured pathologically slow on this backend
            # (ops/pallas_raycast.py) — every vmap(step/detect) owner
            # (parallel/fleet, shared_grid, eval_map) falls back to the
            # XLA stem here, at one altitude. (A jit wrapped INSIDE the
            # vmap would hide the BatchTracer; the repo has no such
            # call site — vmap owners map the plain functions.)
            backend = "xla"
    external = (backend in ("pallas", "pallas2", "pallas3", "im2col")
                and cfg.detector_precision == "float")
    front = external and backend in ("pallas2", "pallas3")
    if planar and not (external and backend != "im2col"):
        # only detector_stem_pallas consumes planar natively; the XLA
        # resize path and the im2col variant take HWC
        images = jnp.transpose(images, (0, 2, 3, 1))
    ycfg = yolov4_tiny.YoloConfig(input_size=cfg.resize,
                                  compute_dtype=dtype,
                                  s2d_stem=cfg.detector_s2d_stem,
                                  stem_external=external and not front,
                                  front_external=front)
    if external:
        from .ops import pallas_stem
        if backend == "im2col":
            net_in = pallas_stem.detector_stem_im2col_xla(
                images, params["detector"], cfg.resize, dtype,
                consts=params.get("detector_stem"))
        else:
            net_in = pallas_stem.detector_stem_pallas(
                images, params["detector"], cfg.resize, dtype,
                consts=params.get("detector_stem"))
            if front:
                from .ops import pallas_csp
                if backend == "pallas3":
                    net_in = pallas_csp.detector_csp_flat(
                        net_in, params["detector"], dtype,
                        consts=params.get("detector_csp_flat"))
                else:
                    net_in = pallas_csp.detector_csp_pallas(
                        net_in, params["detector"], dtype,
                        consts=params.get("detector_csp"))
    else:
        net_in = jax.vmap(
            lambda im: preprocess.preprocess_detector_image(
                im, cfg.resize, compute_dtype=dtype))(images)
    return net_in, ycfg


def detect(params: Dict[str, Any], image: jnp.ndarray,
           cfg: GridVisionConfig) -> Boxes:
    """Image (H, W, 3) [0,255] -> padded pixel-space Boxes (conf desc)."""
    net_in, ycfg = _detector_input(params, image[None], cfg)
    boxes_norm, confs = _detector_forward(params, net_in, ycfg, cfg)
    return extract_boxes(boxes_norm[0], confs[0], cfg)


def detect_with_stats(params: Dict[str, Any], image: jnp.ndarray,
                      cfg: GridVisionConfig):
    """detect + pre-NMS overflow counter (SaturationStats input)."""
    net_in, ycfg = _detector_input(params, image[None], cfg)
    boxes_norm, confs = _detector_forward(params, net_in, ycfg, cfg)
    return extract_boxes(boxes_norm[0], confs[0], cfg, with_overflow=True)


def detect_batch(params: Dict[str, Any], images: jnp.ndarray,
                 cfg: GridVisionConfig):
    """detect over a rig batch (R, H, W, 3) -> (Boxes, overflow) with
    leading rig axis. One true batch-R detector invocation instead of
    vmapping a batch-1 call (vmap threads a dummy unit dim through every
    conv, which skews XLA's layout choices for the maxpool/conv
    fusions)."""
    net_in, ycfg = _detector_input(params, images, cfg)
    boxes_norm, confs = _detector_forward(params, net_in, ycfg, cfg)
    return jax.vmap(
        lambda b, c: extract_boxes(b, c, cfg, with_overflow=True))(
        boxes_norm, confs)


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


def pose_branch(params, obs: Obs, boxes: Boxes, K: jnp.ndarray,
                rng: jnp.ndarray, extrinsics: Extrinsics,
                cfg: GridVisionConfig):
    """The dynamic-pose section of fuse as a standalone: boxes must
    already carry the has_image gate (fuse applies it on entry). Returns
    (camera-frame LShapePoses, box_cloud_truncated int32). THE single
    copy of the vision-vs-PCA dispatch — fuse's internal branch, the
    per-stage timing mode (runtime/timing.py) and the shared-grid
    per-rig path all mirror these rules; keep them routed here."""
    zero = jnp.zeros((), jnp.int32)
    if cfg.use_vision_orientation:
        return _vision_orientation_poses(params, obs.image, boxes,
                                         K, cfg), zero
    cloud_cam = transform_points(extrinsics.lidar_to_camera,
                                 obs.cloud.xyz)
    cloud_valid = obs.cloud.mask() & obs.has_cloud
    return _pca_poses(cloud_cam, cloud_valid, boxes, K, rng, cfg)


def _orientation_dtype(cfg: GridVisionConfig):
    """Compute dtype of the orientation BRANCH (crops + net + solver).

    cfg.orientation_compute="follow" inherits compute_dtype; "float32"
    pins the branch to f32 independent of the detector (the production
    parity knob — see the config.py field comment / PARITY.json)."""
    mode = cfg.orientation_compute
    if mode == "follow":
        mode = cfg.compute_dtype
    return jnp.bfloat16 if mode == "bfloat16" else jnp.float32


def _vision_orientation_poses(params, image, boxes: Boxes,
                              K: jnp.ndarray, cfg: GridVisionConfig):
    """The use_vision_orientation=true branch (:190-209), camera frame."""
    dyn_boxes, _ = _compact_dynamic(boxes, cfg.max_orientation_batch)
    gdtype = _orientation_dtype(cfg)
    crops = preprocess.crop_resize_standardize(
        image, dyn_boxes, cfg.network_height, compute_dtype=gdtype)
    ocfg = orientation_net.OrientationConfig(
        input_size=cfg.network_height, width=cfg.orientation_width,
        arch=cfg.orientation_arch, s2d_fold=cfg.orientation_s2d_fold,
        compute_dtype=gdtype)
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
    pts, pvalid, trunc = association.gather_box_clouds(
        cloud_cam, assignment, boxes.capacity, cfg.max_points_per_box)
    poses = lshape.pca_lshape_poses(
        pts, pvalid, boxes.label, cfg.outlier_radius,
        cfg.outlier_min_neighbors)
    any_dynamic = jnp.any(boxes.valid & is_dynamic(boxes.label))
    n_truncated = jnp.sum((trunc & boxes.valid).astype(jnp.int32))
    return poses.__class__(
        position=poses.position, quat=poses.quat, length=poses.length,
        width=poses.width, height=poses.height, label=poses.label,
        valid=poses.valid & ok & any_dynamic), n_truncated


def step(params: Dict[str, Any], state: GridState, obs: Obs,
         extrinsics: Extrinsics, cfg: GridVisionConfig):
    """One fused tick. Everything on device; no host sync."""
    boxes, prenms_overflow = detect_with_stats(params, obs.image, cfg)
    return fuse(params, state, obs, boxes, extrinsics, cfg,
                prenms_overflow=prenms_overflow)


def step_packed(params: Dict[str, Any], state: GridState,
                packed: jnp.ndarray, extrinsics: Extrinsics,
                cfg: GridVisionConfig):
    """step() on a packed-wire observation (types.Obs.unpack): the
    streaming ingest path — ONE uint8 host->device transfer per frame
    (rgb8 image + packed cloud) instead of six typed arrays. The unpack
    is pure reshape/bitcast, fused into the first consumers."""
    return step(params, state, Obs.unpack(packed, cfg), extrinsics, cfg)


def step_tracked(params: Dict[str, Any], state: GridState, tracks,
                 obs: Obs, extrinsics: Extrinsics, dt,
                 cfg: GridVisionConfig, tcfg):
    """step() + the multi-object tracker in one jit (ops/tracking.py).

    Pure-additive extension: the reference has no tracker (markers are
    regenerated anonymously every tick, grid_vision_node.cpp:405-523)
    and every reference-parity output in StepOutput is unchanged — the
    tracker only consumes it. dt may be traced (variable frame spacing).
    Returns (state', tracks', out, TrackStats)."""
    from .ops import tracking
    new_state, out = step(params, state, obs, extrinsics, cfg)
    new_tracks, tstats = tracking.update_tracks(tracks, out, dt, cfg, tcfg)
    return new_state, new_tracks, out, tstats


def fuse(params: Dict[str, Any], state: GridState, obs: Obs, boxes: Boxes,
         extrinsics: Extrinsics, cfg: GridVisionConfig,
         poses_cam: LShapePoses | None = None,
         prenms_overflow: jnp.ndarray | None = None,
         orientation_dropped: jnp.ndarray | None = None,
         box_cloud_truncated: jnp.ndarray | None = None):
    """Everything after 2D detection: association, pose estimation, grid
    update, outputs. Split out so tests/replay can inject known boxes.

    poses_cam: optionally inject pre-computed camera-frame dynamic poses
    (the fleet-compacted orientation path, fleet_step) — the vision/PCA
    branch is skipped entirely when provided.
    prenms_overflow / orientation_dropped: upstream saturation counters
    threaded into StepOutput.saturation."""
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
    # The reference computes the kNN median depth ONLY for static boxes
    # (computeDepthForBoundingBoxes receives static_bboxes,
    # grid_vision_node.cpp:168-184); dynamic boxes never get one. Compact
    # the static split to max_static_depth query slots (highest
    # confidence first) so the (D, P) distance work scales with the
    # static population instead of the detection capacity; overflow is
    # counted in SaturationStats.static_depth_clamped. The depth-refine
    # extension is the one consumer of dynamic-slot depths — it keeps
    # the full-capacity query.
    refine_wants_all = cfg.vision_depth_refine and cfg.use_vision_orientation
    if cfg.max_static_depth < boxes.capacity and not refine_wants_all:
        s_cap = cfg.max_static_depth
        score = jnp.where(static_mask, boxes.confidence, -1.0)
        _, knn_take = jax.lax.top_k(score, s_cap)
        knn_take = knn_take.astype(jnp.int32)
        q_boxes = Boxes(xyxy=boxes.xyxy[knn_take],
                        confidence=boxes.confidence[knn_take],
                        label=boxes.label[knn_take],
                        valid=static_mask[knn_take])
        n_static = jnp.sum(static_mask.astype(jnp.int32))
        static_depth_clamped = jnp.maximum(0, n_static - s_cap)
    else:
        q_boxes, knn_take = boxes, None
        static_depth_clamped = jnp.zeros((), jnp.int32)
    if cfg.knn_backend == "pallas":
        from .ops.pallas_knn import knn_median_depth_pallas
        q_depths = knn_median_depth_pallas(uvd, uvd_valid, q_boxes,
                                           cfg.k_near)
    elif cfg.knn_backend == "approx":
        q_depths = association.knn_median_depth_approx(uvd, uvd_valid,
                                                       q_boxes, cfg.k_near)
    else:
        q_depths = association.knn_median_depth(uvd, uvd_valid, q_boxes,
                                                cfg.k_near)
    if knn_take is None:
        depths = q_depths
    else:
        # Scatter back to box slots; unselected slots keep the
        # reference's preallocated default (-1.0, cloud_detections.cpp:49).
        depths = jnp.full((boxes.capacity,), -1.0).at[knn_take].set(
            jnp.where(q_boxes.valid, q_depths, -1.0))
    cam_points = pixel_to_3d(boxes.centers(), depths, K_inv)
    base_points = transform_points(extrinsics.camera_to_base, cam_points)
    static_points = jnp.where(static_mask[:, None], base_points, 0.0)

    # --- dynamic branch: 3D poses (camera frame) ------------------------
    zero = jnp.zeros((), jnp.int32)
    box_cloud_truncated = (zero if box_cloud_truncated is None
                           else box_cloud_truncated.astype(jnp.int32))
    if poses_cam is None:
        if cfg.use_vision_orientation:
            poses_cam = _vision_orientation_poses(params, obs.image, boxes,
                                                  K, cfg)
        else:
            poses_cam, box_cloud_truncated = _pca_poses(
                cloud_cam, cloud_valid, boxes, K, rng, cfg)
    if cfg.vision_depth_refine and cfg.use_vision_orientation:
        # Extension: the Deep3DBox 64-combo solver recovers range purely
        # from the 2D box + dims prior (reference behavior; measured
        # median position error ~5 m on scene GT, train/eval_pose.py) —
        # but the kNN median cloud depth of the same box is already
        # computed above for the static branch. Rescale the location
        # along its ray to the measured depth (keeps the solver's
        # bearing + yaw + dims): cloud-limited localization at zero
        # extra device cost.
        # pose slots are the compacted dynamic batch; realign depths
        # (the compaction is deterministic in boxes, so this matches
        # both the in-fuse and the fleet-injected pose paths)
        dyn_boxes, take_idx = _compact_dynamic(boxes, poses_cam.capacity)
        depths_c = depths[take_idx]
        z = poses_cam.position[:, 2]
        # the kNN median depth samples the object's NEAR surface; the
        # center sits half the yaw-projected footprint extent farther
        # along the viewing ray
        o = -2.0 * jnp.arctan2(poses_cam.quat[:, 1], poses_cam.quat[:, 3])
        px = poses_cam.position[:, 0]
        r = jnp.sqrt(px * px + z * z)
        ux = px / jnp.maximum(r, 0.5)
        uz = z / jnp.maximum(r, 0.5)
        along = jnp.abs(ux * jnp.cos(o) - uz * jnp.sin(o))
        across = jnp.abs(ux * jnp.sin(o) + uz * jnp.cos(o))
        half_ext = 0.5 * (along * poses_cam.length
                          + across * poses_cam.width)
        ok_knn = (poses_cam.valid & (depths_c > 0.0) & (z > 0.5)
                  & obs.has_cloud)
        # Monocular height-cue range: depth = fy * H / h_px with the
        # MultiBin metric height (class prior + trained residual) and
        # the 2D box's pixel height. Two jobs: (a) fallback when no kNN
        # cloud depth exists (sparse/absent cloud); (b) occlusion gate —
        # the kNN median at the bbox center belongs to the OCCLUDER when
        # boxes overlap (measured: a 3x range underestimate tail), and
        # pixel height is immune to that, so a kNN depth inconsistent
        # with the height cue is rejected in favor of the cue.
        h_px = dyn_boxes.xyxy[:, 3] - dyn_boxes.xyxy[:, 1]
        # The 2D box's top/bottom edges are both set by the NEAR face of
        # the 3D box (more extreme projection at smaller z), so the
        # height cue estimates the near-surface depth — the same
        # convention as the kNN median; both get the half-footprint
        # push-out to the center.
        depth_mono = (K[1, 1] * poses_cam.height
                      / jnp.maximum(h_px, 1.0))
        ok_mono = poses_cam.valid & (h_px > 4.0) & (z > 0.5)
        knn_center = depths_c + half_ext
        mono_center = depth_mono + half_ext
        # One-sided: occlusion can only pull the kNN depth NEARER than
        # the true range (the occluder is in front), and the height cue
        # itself carries dims-prior error — so reject kNN only when it
        # is clearly NEARER than the cue says, never when it is farther.
        consistent = knn_center > 0.8 * mono_center
        use_knn = ok_knn & (consistent | ~ok_mono)
        scale = jnp.where(
            use_knn, knn_center / jnp.maximum(z, 0.5),
            jnp.where(ok_mono, mono_center / jnp.maximum(z, 0.5), 1.0))
        poses_cam = LShapePoses(
            position=poses_cam.position * scale[:, None],
            quat=poses_cam.quat, length=poses_cam.length,
            width=poses_cam.width, height=poses_cam.height,
            label=poses_cam.label, valid=poses_cam.valid)
    if cfg.use_vision_orientation:
        n_dyn = jnp.sum((boxes.valid & is_dynamic(boxes.label))
                        .astype(jnp.int32))
        orientation_clamped = jnp.maximum(
            0, n_dyn - cfg.max_orientation_batch)
    else:
        orientation_clamped = zero
    saturation = SaturationStats(
        prenms_overflow=(zero if prenms_overflow is None
                         else prenms_overflow.astype(jnp.int32)),
        orientation_clamped=orientation_clamped,
        box_cloud_truncated=box_cloud_truncated,
        orientation_dropped=(zero if orientation_dropped is None
                             else orientation_dropped.astype(jnp.int32)),
        static_depth_clamped=static_depth_clamped,
    )

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
        static_depths=depths,
        static_boxes=static_boxes,
        occupancy_i8=rasterize.export_occupancy_i8(new_occ),
        saturation=saturation,
    )
    return new_state, out


def _fleet_vision_poses(params, images: jnp.ndarray, boxes_b: Boxes,
                        K: jnp.ndarray, cfg: GridVisionConfig,
                        budget: int):
    """Fleet-compacted VisionOrientation: gather the top-`budget` dynamic
    boxes ACROSS all rigs (by confidence) into one global crop batch, run
    the net once, scatter camera-frame poses back per rig.

    The reference node runs its TRT engine only on the dynamic boxes a
    frame actually produced (src/grid_vision_node.cpp:187-194) — load-
    proportional compute. A per-rig fixed-shape batch pays the worst case
    (max_orientation_batch crops) on EVERY rig every step; compacting
    across the fleet restores load-proportionality while staying
    static-shaped. Semantics: each rig first clamps to
    max_orientation_batch in confidence order (quirk Q7), then the
    fleet-wide budget keeps the `budget` highest-confidence candidates;
    with budget >= n_rigs * max_orientation_batch the result is
    exactly vmap(step) (tested in tests/test_fleet_compaction.py).

    Returns (poses_b (R, cap) camera-frame LShapePoses,
             dropped_b (R,) int32 valid candidates lost to the budget).
    """
    n_rigs = images.shape[0]
    cap = cfg.max_orientation_batch
    budget = min(budget, n_rigs * cap)

    dyn_b, _ = jax.vmap(lambda b: _compact_dynamic(b, cap))(boxes_b)
    flat = jax.tree_util.tree_map(
        lambda x: x.reshape((n_rigs * cap,) + x.shape[2:]), dyn_b)
    score = jnp.where(flat.valid, flat.confidence, -1.0)
    _, top_idx = jax.lax.top_k(score, budget)          # unique positions
    use_pallas = cfg.orientation_stem_backend == "pallas"
    if use_pallas:
        # rig-grouped crop order: consecutive kernel grid steps then
        # read the same rig's frame and Pallas elides the repeated
        # image DMA. Order is irrelevant downstream (poses scatter
        # back by index).
        top_idx = jnp.sort(top_idx)

    g_boxes = Boxes(xyxy=flat.xyxy[top_idx],
                    confidence=flat.confidence[top_idx],
                    label=flat.label[top_idx],
                    valid=flat.valid[top_idx])
    gdtype = _orientation_dtype(cfg)
    ocfg = orientation_net.OrientationConfig(
        input_size=cfg.network_height, width=cfg.orientation_width,
        arch=cfg.orientation_arch, s2d_fold=cfg.orientation_s2d_fold,
        compute_dtype=gdtype, stem_external=use_pallas)
    if use_pallas:
        # Fused Pallas front end (ops/pallas_orient.py): crop-resize +
        # standardize + the 12x12/s8 s2d stem conv in one VMEM pass per
        # COMPACTED crop — only the `budget` kept crops are computed at
        # all (the XLA path below crops every cap slot per rig first).
        from .ops import pallas_orient
        consts = params.get("orientation_stem")
        if consts is None:
            consts = pallas_orient.prepare_orient_constants(
                params["orientation"], cfg.network_height,
                cfg.orientation_width)
        acts = pallas_orient.orient_front_pallas(
            images, g_boxes.xyxy, g_boxes.valid,
            (top_idx // cap).astype(jnp.int32), consts,
            cfg.network_height, gdtype)
        orient, conf, dims = orientation_net.forward(
            params["orientation"], acts, ocfg)
    else:
        # Crop per rig against its OWN image (shared-image interpolation
        # matmuls), then compact the small crops for the net. Gathering
        # full source images per selected crop was measured ~2.5x more
        # expensive than the padded per-rig sampling IN XLA: duplicating
        # (budget) 480x640 images moves ~1.2 GB/step through HBM (XLA
        # lowers it to serialized dynamic-slice loops), while crops are
        # ~300 KB each. (The Pallas branch above sidesteps this with
        # scalar-prefetch image indexing — no image copies at all.)
        #
        # Standardize AFTER compaction: the per-crop mean/var normalize
        # is the profile's top VPU item and is per-crop elementwise, so
        # running it on only the `budget` kept crops is bit-identical
        # and skips (n_rigs*cap - budget)/(n_rigs*cap) of it.
        crops_raw = jax.vmap(
            lambda im, b: preprocess.crop_resize(
                im, b, cfg.network_height, compute_dtype=gdtype,
                out_dtype=gdtype)
            )(images, dyn_b)                           # (R, cap, S, S, 3)
        crops = preprocess._standardize(
            crops_raw.reshape(
                (n_rigs * cap,) + crops_raw.shape[2:])[top_idx],
            g_boxes.valid, out_dtype=gdtype)
        orient, conf, dims = orientation_net.forward(
            params["orientation"], crops, ocfg)
    poses_g = multibin.multibin_poses(orient, conf, dims, g_boxes, K, cfg)

    def scatter(x, fill):
        out = jnp.full((n_rigs * cap,) + x.shape[1:], fill, x.dtype)
        out = out.at[top_idx].set(x)
        return out.reshape((n_rigs, cap) + x.shape[1:])

    poses_b = LShapePoses(
        position=scatter(poses_g.position, 0.0),
        quat=scatter(poses_g.quat, 0.0),
        length=scatter(poses_g.length, 0.0),
        width=scatter(poses_g.width, 0.0),
        height=scatter(poses_g.height, 0.0),
        label=scatter(poses_g.label, 0),
        valid=scatter(poses_g.valid, False),
    )
    n_valid = jnp.sum(flat.valid.reshape(n_rigs, cap), axis=-1)
    n_kept = jnp.sum(scatter(g_boxes.valid, False), axis=-1)
    dropped_b = (n_valid - n_kept).astype(jnp.int32)
    return poses_b, dropped_b


def fleet_step(params: Dict[str, Any], states: GridState, obs_b: Obs,
               extrinsics: Extrinsics, cfg: GridVisionConfig,
               orientation_budget: int | None = None):
    """vmap(step) over a rig axis, with optional fleet-level orientation
    batching (see _fleet_vision_poses). orientation_budget=None or PCA
    mode falls back to plain vmap."""
    if not cfg.use_vision_orientation or orientation_budget is None:
        # (the vmapped steps fall back to the XLA stem inside
        # _detector_input — see the BatchTracer guard there)
        return jax.vmap(
            functools.partial(step, cfg=cfg),
            in_axes=(None, 0, 0, None))(params, states, obs_b, extrinsics)

    boxes_b, overflow_b = detect_batch(params, obs_b.image, cfg)
    boxes_b = Boxes(xyxy=boxes_b.xyxy, confidence=boxes_b.confidence,
                    label=boxes_b.label,
                    valid=boxes_b.valid & obs_b.has_image[:, None])
    K = intrinsic_matrix(cfg.fx, cfg.fy, cfg.cx, cfg.cy)
    poses_b, dropped_b = _fleet_vision_poses(
        params, obs_b.image, boxes_b, K, cfg, orientation_budget)
    return jax.vmap(
        lambda p, s, o, b, e, pc, ov, dr: fuse(
            p, s, o, b, e, cfg, pc, prenms_overflow=ov,
            orientation_dropped=dr),
        in_axes=(None, 0, 0, 0, None, 0, 0, 0))(
        params, states, obs_b, boxes_b, extrinsics, poses_b, overflow_b,
        dropped_b)


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
        if (cfg.detector_precision == "int8"
                and "detector_q" not in params):
            from .models import yolov4_int8
            params = dict(params)
            params["detector_q"] = yolov4_int8.quantize_detector(
                params["detector"])
        if (cfg.detector_stem_backend in ("pallas", "pallas2",
                                          "pallas3", "im2col")
                and cfg.detector_precision == "float"
                and "detector_stem" not in params):
            # fold the stem weights ONCE on the host (XLA does not
            # reliably hoist loop-invariant weight math out of scan
            # bodies on this backend — see ops/pallas_stem.py)
            from .ops import pallas_stem
            params = dict(params)
            params["detector_stem"] = pallas_stem.prepare_stem_constants(
                params["detector"])
        if (cfg.orientation_stem_backend == "pallas"
                and cfg.use_vision_orientation
                and "orientation_stem" not in params):
            from .ops import pallas_orient
            params = dict(params)
            params["orientation_stem"] = \
                pallas_orient.prepare_orient_constants(
                    params["orientation"], cfg.network_height,
                    cfg.orientation_width)
        if (cfg.detector_stem_backend == "pallas2"
                and cfg.detector_precision == "float"
                and "detector_csp" not in params):
            from .ops import pallas_csp
            params = dict(params)
            params["detector_csp"] = pallas_csp.prepare_csp_constants(
                params["detector"])
        if (cfg.detector_stem_backend == "pallas3"
                and cfg.detector_precision == "float"
                and "detector_csp_flat" not in params):
            from .ops import pallas_csp
            params = dict(params)
            params["detector_csp_flat"] = \
                pallas_csp.prepare_csp_flat_constants(params["detector"])
        # Pin to device: checkpoint.restore returns host numpy arrays, and
        # passing those into a jitted step re-uploads every weight on
        # EVERY dispatch (measured 3.5x whole-pipeline slowdown through
        # this machine's high-latency tunnel).
        self.params = jax.device_put(params)
        self._step = jax.jit(functools.partial(step, cfg=self.cfg),
                             donate_argnums=(1,))
        self._step_packed = jax.jit(
            functools.partial(step_packed, cfg=self.cfg),
            donate_argnums=(1,))
        self._chunk_jits: Dict[int, Any] = {}
        self._tracked_jits: Dict[Any, Any] = {}
        self._delta_jits = None

    def init_state(self, seed: int = 0) -> GridState:
        return GridState.create(self.cfg, seed)

    def init_tracks(self, tcfg=None):
        """Fresh tracker state for call_tracked (ops/tracking.py)."""
        from .ops import tracking
        return tracking.TrackState.create(tcfg or tracking.TrackConfig())

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

    def call_packed(self, state: GridState, packed) -> tuple:
        """step on a packed-wire observation (host uint8 buffer or
        device array; see types.Obs.pack_bytes)."""
        return self._step_packed(self.params, state, packed,
                                 self.extrinsics)

    def call_tracked(self, state: GridState, tracks, obs: Obs,
                     dt=0.05, tcfg=None):
        """Fused step + multi-object tracker (pipeline.step_tracked).
        dt defaults to the reference's 50 ms tick; pass the real frame
        spacing when pacing differs. Returns (state', tracks', out,
        TrackStats)."""
        from .ops import tracking
        tcfg = tcfg or tracking.TrackConfig()
        fn = self._tracked_jits.get(tcfg)
        if fn is None:
            fn = jax.jit(functools.partial(step_tracked, cfg=self.cfg,
                                           tcfg=tcfg),
                         donate_argnums=(1, 2))
            self._tracked_jits[tcfg] = fn
        return fn(self.params, state, tracks, obs,
                  self.extrinsics, jnp.asarray(dt, jnp.float32))

    def call_packed_delta(self, state: GridState, prev_image_u8, buf,
                          keyframe: bool):
        """ROI-delta streaming step (types.pack_delta_bytes wire).

        prev_image_u8: the device-resident (H, W, 3) uint8 previous
        frame (carry what this returns). keyframe=True takes a full
        Obs.pack_bytes buffer instead (the encoder's fallback when the
        changed region exceeds the ROI window — types.delta_roi_shape).
        Two compiled programs total, both static-shaped. Returns
        (state', image_u8', out)."""
        if self.cfg.wire_image_codec != "rgb8":
            raise ValueError("the ROI-delta wire ships raw rgb8 windows;"
                             " set wire_image_codec='rgb8'")
        if self._delta_jits is None:
            cfg = self.cfg

            @functools.partial(jax.jit, donate_argnums=(1, 2))
            def key_fn(params, state, prev, buf, extr):
                obs = Obs.unpack(buf, cfg)
                s2, out = step(params, state, obs, extr, cfg)
                return s2, obs.image.astype(jnp.uint8), out

            @functools.partial(jax.jit, donate_argnums=(1, 2))
            def delta_fn(params, state, prev, buf, extr):
                from .types import unpack_delta
                obs = unpack_delta(buf, prev, cfg)
                s2, out = step(params, state, obs, extr, cfg)
                return s2, obs.image, out

            self._delta_jits = (key_fn, delta_fn)
        fn = self._delta_jits[0] if keyframe else self._delta_jits[1]
        return fn(self.params, state, prev_image_u8, buf,
                  self.extrinsics)

    def call_packed_chunk(self, state: GridState, chunk):
        """Throughput-mode ingest: a (K, nbytes) stack of packed frames
        runs as ONE transfer + ONE scan dispatch of K sequential steps.
        On a latency-bound host link (this machine's tunnel: ~15 ms per
        round trip regardless of size) this amortizes the fixed cost over
        K frames at the price of K-frame output latency.

        Returns (state', outs) where outs is the STACKED per-step
        StepOutput (leading K axis, device-resident until read): every
        frame's publish payload is computed — the chunked mode delays
        outputs, it does not drop them (the reference publishes every
        tick; a scan that discarded StepOutput would also let XLA
        dead-code the static kNN branch and grid export and measure a
        program production never runs). The temporal sequence semantics
        are identical to K call_packed steps."""
        k = int(chunk.shape[0])
        fn = self._chunk_jits.get(k)
        if fn is None:
            cfg = self.cfg

            @functools.partial(jax.jit, donate_argnums=(1,))
            def fn(params, state, bufs, extr):
                def body(s, b):
                    s2, out = step_packed(params, s, b, extr, cfg)
                    return s2, out
                return jax.lax.scan(body, state, bufs)

            self._chunk_jits[k] = fn
        return fn(self.params, state, chunk, self.extrinsics)
