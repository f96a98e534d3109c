"""Multi-rig SHARED-grid fusion: many sensors, one world occupancy grid.

The reference deploys one node per vehicle, each with a private grid.
The fleet layer (parallel/fleet.py) keeps that shape (N rigs, N grids,
zero collectives). This module adds the capability the reference never
had: N rigs observing the SAME world — a sensor hub, an intersection
with multiple roadside units, a convoy — fused into ONE shared
occupancy grid, sharded over an ICI mesh.

SPMD shape (SURVEY §2.2's "optional multi-chip shared-grid variant"):
rigs are sharded over the `rig` mesh axis; each device runs detection +
pose estimation for its local rigs, rasterizes their footprint HIT
COUNTS into a full-size local accumulator (the grid is small — 400 KB —
so it stays replicated), and a single `lax.psum` over ICI merges the
fleet's evidence before one decay+hit+clamp+sigmoid update. Per step,
exactly ONE collective of one grid-sized array crosses the interconnect
regardless of rig count.

Bayesian semantics: k rigs seeing the same cell contribute k hit
increments — independent evidence accumulates additively in log-odds,
which is exactly the multi-sensor fusion rule. With one rig the update
is bit-identical to the single-rig rasterizer (tested).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .. import pipeline
from ..config import GridVisionConfig
from ..geometry import intrinsic_matrix, transform_points, transform_pose
from ..ops import rasterize
from ..types import Extrinsics, LShapePoses, Obs
from .mesh import rig_mesh


def _to_world(poses_cam: LShapePoses, extrinsics: Extrinsics,
              gate: jnp.ndarray) -> LShapePoses:
    """camera-frame poses -> world frame, masked by the rig's Q1 gate
    (shared by the per-rig and the budget-compacted paths so the gating
    rules cannot drift apart)."""
    pos, quat = transform_pose(
        extrinsics.camera_to_base, poses_cam.position, poses_cam.quat)
    return LShapePoses(
        position=pos, quat=quat, length=poses_cam.length,
        width=poses_cam.width, height=poses_cam.height,
        label=poses_cam.label, valid=poses_cam.valid & gate)


def rig_world_poses(params: Dict[str, Any], obs: Obs,
                    extrinsics: Extrinsics, cfg: GridVisionConfig,
                    rng: jnp.ndarray) -> LShapePoses:
    """One rig's dynamic-object poses in the WORLD frame (the rig's
    camera_to_base here maps into the shared world). Mirrors the pose
    section of pipeline.fuse; the Q1 gate masks a silent rig's
    contribution to nothing."""
    boxes = pipeline.detect(params, obs.image, cfg)
    boxes = boxes.__class__(xyxy=boxes.xyxy, confidence=boxes.confidence,
                            label=boxes.label,
                            valid=boxes.valid & obs.has_image)
    cloud_cam = transform_points(extrinsics.lidar_to_camera, obs.cloud.xyz)
    cloud_valid = obs.cloud.mask() & obs.has_cloud
    K = intrinsic_matrix(cfg.fx, cfg.fy, cfg.cx, cfg.cy)
    if cfg.use_vision_orientation:
        poses_cam = pipeline._vision_orientation_poses(
            params, obs.image, boxes, K, cfg)
    else:
        poses_cam, _trunc = pipeline._pca_poses(
            cloud_cam, cloud_valid, boxes, K, rng, cfg)
    return _to_world(poses_cam, extrinsics,
                     obs.has_image | obs.has_cloud)


def shared_grid_step(params: Dict[str, Any], log_odds: jnp.ndarray,
                     obs_b: Obs, extr_b: Extrinsics, keys: jnp.ndarray,
                     cfg: GridVisionConfig,
                     axis_name: Optional[str] = None,
                     poses_fn=None,
                     orientation_budget: Optional[int] = None):
    """One fused world-grid tick over a (local) batch of rigs.

    obs_b / extr_b / keys carry a leading rig axis. With axis_name set
    (inside shard_map) the hit counts are psum-merged across the mesh
    before the single grid update. poses_fn overrides the per-rig pose
    pipeline (tests inject known poses). orientation_budget routes the
    vision branch through the fleet-compacted crop batch
    (pipeline._fleet_vision_poses — one net invocation for the shard's
    rigs instead of a padded batch per rig; measured 3x the whole-tick
    rate at 8 rigs). Returns (log_odds', occupancy', dropped) where
    dropped counts valid dynamic detections lost to the budget across
    the whole fleet (0 on the un-budgeted paths) — the saturation
    telemetry the budget would otherwise hide.
    """
    dropped = jnp.zeros((), jnp.int32)
    if (poses_fn is None and cfg.use_vision_orientation
            and orientation_budget is not None):
        boxes_b, _ov = pipeline.detect_batch(params, obs_b.image, cfg)
        boxes_b = boxes_b.__class__(
            xyxy=boxes_b.xyxy, confidence=boxes_b.confidence,
            label=boxes_b.label,
            valid=boxes_b.valid & obs_b.has_image[:, None])
        K = intrinsic_matrix(cfg.fx, cfg.fy, cfg.cx, cfg.cy)
        poses_cam_b, dropped_b = pipeline._fleet_vision_poses(
            params, obs_b.image, boxes_b, K, cfg, orientation_budget)
        dropped = jnp.sum(dropped_b).astype(jnp.int32)
        gate_b = obs_b.has_image | obs_b.has_cloud
        poses_b = jax.vmap(_to_world)(poses_cam_b, extr_b, gate_b)
        counts = jnp.sum(jax.vmap(
            lambda p: rasterize.lshape_hit_counts(p, cfg))(poses_b),
            axis=0)
    else:
        fn = poses_fn or rig_world_poses

        def one(obs, extr, key):
            poses = fn(params, obs, extr, cfg, key)
            return rasterize.lshape_hit_counts(poses, cfg)

        counts = jnp.sum(jax.vmap(one)(obs_b, extr_b, keys), axis=0)
    if axis_name is not None:
        counts = jax.lax.psum(counts, axis_name)
        dropped = jax.lax.psum(dropped, axis_name)
    log_odds = log_odds + cfg.log_odds_decay + cfg.log_odds_hit * counts
    lo, occ = rasterize._finish(log_odds, cfg)
    return lo, occ, dropped


class SharedGrid:
    """N rigs -> one world grid, rigs sharded over the `rig` mesh."""

    def __init__(self, cfg: GridVisionConfig, n_rigs: int,
                 mesh: Optional[Mesh] = None,
                 params: Optional[Dict[str, Any]] = None, seed: int = 0,
                 poses_fn=None, orientation_budget: Optional[int] = None):
        cfg.validate()
        # extension knobs this fused path does not implement must fail
        # loudly, not silently diverge from pipeline.fuse semantics
        unsupported = [k for k, v in (
            ("yaw_aware_rasterization", cfg.yaw_aware_rasterization),
            ("raycast_free_space", cfg.raycast_free_space),
            ("vision_depth_refine", cfg.vision_depth_refine),
            ("grid_backend=pallas", cfg.grid_backend == "pallas"),
        ) if v]
        if unsupported:
            raise ValueError(
                f"SharedGrid does not support {unsupported}; use the "
                "per-rig fleet for those extensions")
        self.cfg = cfg
        self.n_rigs = n_rigs
        self.mesh = mesh or rig_mesh()
        n_dev = self.mesh.devices.size
        if n_rigs % n_dev:
            raise ValueError(f"n_rigs {n_rigs} % devices {n_dev} != 0")
        engine = pipeline.Engine(cfg, params=params, seed=seed)
        self.params = engine.params

        try:
            from jax import shard_map
        except ImportError:          # older jax
            from jax.experimental.shard_map import shard_map

        @functools.partial(jax.jit, donate_argnums=(1,))
        @functools.partial(
            shard_map, mesh=self.mesh,
            in_specs=(P(), P(), P("rig"), P("rig"), P("rig")),
            out_specs=(P(), P(), P()))
        def _step(params, log_odds, obs_b, extr_b, keys):
            return shared_grid_step(params, log_odds, obs_b, extr_b,
                                    keys, cfg, axis_name="rig",
                                    poses_fn=poses_fn,
                                    orientation_budget=orientation_budget)

        self._step = _step

        # K-tick scan-chained variant (one dispatch per K world ticks):
        # the fusion hub's answer to Engine.call_packed_chunk — on a
        # ~15 ms-per-dispatch host link, per-tick dispatch rate-caps the
        # hub at ~55 Hz regardless of compute; scanning K ticks inside
        # one dispatch amortizes it to nothing at the price of K-tick
        # output latency. Semantics are EXACTLY K sequential _step calls
        # (tested). EVERY tick's occupancy export materializes (stacked,
        # leading K axis) — chunking delays the publish stream, it does
        # not drop it, and discarding per-tick grids would also let XLA
        # dead-code the per-tick export.
        @functools.partial(
            shard_map, mesh=self.mesh,
            in_specs=(P(), P(), P(None, "rig"), P("rig"), P(None, "rig")),
            out_specs=(P(), P(), P()))
        def _chunk_sm(params, log_odds, obs_c, extr_b, keys_c):
            def body(lo, xs):
                obs_b, keys = xs
                lo2, occ, dropped = shared_grid_step(
                    params, lo, obs_b, extr_b, keys, cfg,
                    axis_name="rig", poses_fn=poses_fn,
                    orientation_budget=orientation_budget)
                return lo2, (occ, dropped)
            lo, (occ_c, drops) = jax.lax.scan(body, log_odds,
                                              (obs_c, keys_c))
            return lo, occ_c, jnp.sum(drops)

        # The key fan-out (split per tick, then per rig) happens INSIDE
        # the jit: eager splits were two extra host dispatches per
        # call_chunk — pure overhead on a ~15 ms-per-dispatch link. The
        # stream is identical to K sequential __call__ ticks.
        @functools.partial(jax.jit, donate_argnums=(1,))
        def _chunk(params, log_odds, obs_c, extr_b, step_key):
            k = jax.tree_util.tree_leaves(obs_c)[0].shape[0]
            keys_c = jax.vmap(
                lambda kk: jax.random.split(kk, self.n_rigs))(
                    jax.random.split(step_key, k))
            return _chunk_sm(params, log_odds, obs_c, extr_b, keys_c)

        self._chunk = _chunk

    def init_grid(self) -> jnp.ndarray:
        h, w = self.cfg.grid_size
        return jnp.zeros((h, w), jnp.float32)

    def __call__(self, log_odds: jnp.ndarray, obs_b: Obs,
                 extr_b: Extrinsics, step_key: jnp.ndarray):
        """-> (log_odds', occupancy', dropped) — dropped is the fleet-
        wide count of detections lost to orientation_budget this tick."""
        keys = jax.random.split(step_key, self.n_rigs)
        return self._step(self.params, log_odds, obs_b, extr_b, keys)

    def call_chunk(self, log_odds: jnp.ndarray, obs_c: Obs,
                   extr_b: Extrinsics, step_key: jnp.ndarray):
        """K world ticks in ONE dispatch (lax.scan inside the mesh).

        obs_c carries a leading (K, n_rigs) axis pair; the key stream
        matches K sequential __call__ ticks (split K times, then per
        rig — fanned out in-graph, one dispatch per chunk).
        Returns (log_odds', occupancies (K, H, W) — one per tick,
        device-resident until read, dropped_total)."""
        return self._chunk(self.params, log_odds, obs_c, extr_b,
                           step_key)
