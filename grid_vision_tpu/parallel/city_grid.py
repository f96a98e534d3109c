"""City-scale occupancy grid: SPATIALLY sharded over the device mesh.

The reference grid is one vehicle's 50x20 m local map (500x200 cells,
400 KB — occupancy_grid.cpp:4-14). A metropolitan deployment wants the
opposite aspect: ONE persistent world grid covering kilometres, fed by
many rigs — too large to update comfortably on one chip once the cell
count reaches the hundreds of millions (a 2x2 km map at 0.1 m is
4x10^8 cells x 2 layers x f32 = 3.2 GB plus update temporaries).

Sharding shape: the grid's row axis is split over the `x` mesh axis
(jax.sharding / shard_map), object poses are replicated (they are tiny
— kilobytes — next to the grid), and every device rasterizes the full
pose set against ITS row window only. Cell updates are independent, so
there is NO halo and NO per-step collective at all: a box footprint
spanning a slab boundary simply rasterizes partially on each of the two
slabs, which compose exactly. Per-cell math (decay + hit*count + clamp
+ sigmoid) is identical to the local rasterizer (ops/rasterize.py),
tested bit-equal against it on an unsharded reference.

Combined with parallel/shared_grid.py this completes the scaling story:
shared_grid scales RIG COUNT into one small grid (one psum);
city_grid scales GRID AREA across devices (zero collectives).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..types import LShapePoses


@dataclasses.dataclass(frozen=True)
class CityGridSpec:
    """World-grid geometry (grid_map conventions, like GridVisionConfig:
    x forward in meters, centered at `center`)."""
    length_x: float = 400.0          # meters
    length_y: float = 200.0
    resolution: float = 0.1
    center: Tuple[float, float] = (0.0, 0.0)
    log_odds_decay: float = -0.2
    log_odds_hit: float = 0.85
    min_log_odds: float = -2.0
    max_log_odds: float = 3.6

    @property
    def shape(self) -> Tuple[int, int]:
        return (int(round(self.length_x / self.resolution)),
                int(round(self.length_y / self.resolution)))


def slab_hit_counts(poses: LShapePoses, spec: CityGridSpec,
                    row0, slab_h: int) -> jnp.ndarray:
    """(slab_h, W) footprint cover counts for the global row window
    [row0, row0 + slab_h) — rasterize.corner_window_counts with this
    spec's geometry (one shared rasterization primitive; the off-map
    skip quirk cannot drift between the local/shared/city paths)."""
    from ..ops.rasterize import (corner_window_counts,
                                 pose_footprint_corners)
    _, w = spec.shape
    return corner_window_counts(
        pose_footprint_corners(poses), poses.valid, spec.center,
        (spec.length_x, spec.length_y), spec.resolution, slab_h, w,
        row0=row0)


def city_update(log_odds: jnp.ndarray, poses: LShapePoses,
                spec: CityGridSpec, row0=0):
    """decay + hit*count + clamp + sigmoid on one (slab) array."""
    counts = slab_hit_counts(poses, spec, row0, log_odds.shape[0])
    lo = log_odds + spec.log_odds_decay + spec.log_odds_hit * counts
    lo = jnp.clip(lo, spec.min_log_odds, spec.max_log_odds)
    return lo, 1.0 / (1.0 + jnp.exp(-lo))


class CityGrid:
    """The sharded world grid. Rows split over the mesh's `x` axis."""

    def __init__(self, spec: CityGridSpec, mesh: Optional[Mesh] = None):
        self.spec = spec
        if mesh is None:
            devs = np.array(jax.devices())
            mesh = Mesh(devs, ("x",))
        self.mesh = mesh
        n_dev = mesh.devices.size
        h, w = spec.shape
        if h % n_dev:
            raise ValueError(f"grid rows {h} % devices {n_dev} != 0")
        self._slab_h = h // n_dev
        self._sharding = NamedSharding(mesh, P("x", None))

        try:
            from jax import shard_map
        except ImportError:
            from jax.experimental.shard_map import shard_map

        @functools.partial(jax.jit, donate_argnums=(0,))
        @functools.partial(shard_map, mesh=mesh,
                           in_specs=(P("x", None), P()),
                           out_specs=(P("x", None), P("x", None)))
        def _update(lo_slab, poses):
            row0 = jax.lax.axis_index("x") * self._slab_h
            return city_update(lo_slab, poses, spec, row0)

        self._update = _update

    def init_grid(self) -> jnp.ndarray:
        return jax.device_put(jnp.zeros(self.spec.shape, jnp.float32),
                              self._sharding)

    def update(self, log_odds: jnp.ndarray, poses: LShapePoses):
        """One tick: world-frame poses (replicated; flatten multiple
        rigs' pose sets with types.tree_stack + reshape before calling)
        -> (log_odds', occupancy'), both row-sharded."""
        return self._update(log_odds, poses)


class CityFusion:
    """End-to-end metropolitan pipeline: N rigs (sharded over the mesh)
    run detection + pose estimation, their WORLD-frame poses gather
    (kilobytes) onto every device, and the row-sharded city grid
    rasterizes them against its slabs — rig parallelism for the sensors,
    spatial parallelism for the map, in two dispatches per tick."""

    def __init__(self, spec: CityGridSpec, cfg, n_rigs: int,
                 mesh: Optional[Mesh] = None, params=None, seed: int = 0,
                 poses_fn=None):
        from jax.sharding import PartitionSpec
        from .mesh import rig_mesh

        if mesh is None:
            mesh = rig_mesh()
        from .. import pipeline as _pipeline
        from .shared_grid import rig_world_poses
        cfg.validate()
        n_dev = mesh.devices.size
        if n_rigs % n_dev:
            raise ValueError(f"n_rigs {n_rigs} % devices {n_dev} != 0")
        self.cfg = cfg
        self.spec = spec
        self.n_rigs = n_rigs
        self.mesh = mesh
        engine = _pipeline.Engine(cfg, params=params, seed=seed)
        self.params = engine.params
        self.city = CityGrid(spec, mesh=Mesh(mesh.devices, ("x",)))
        fn = poses_fn or rig_world_poses

        try:
            from jax import shard_map
        except ImportError:
            from jax.experimental.shard_map import shard_map
        P = PartitionSpec

        @functools.partial(jax.jit)
        @functools.partial(shard_map, mesh=mesh,
                           in_specs=(P(), P("rig"), P("rig"), P("rig")),
                           out_specs=jax.tree_util.tree_map(
                               lambda _: P("rig"),
                               LShapePoses.empty(1)))
        def _poses(params, obs_b, extr_b, keys):
            return jax.vmap(
                lambda o, e, k: fn(params, o, e, self.cfg, k))(
                obs_b, extr_b, keys)

        self._poses = _poses

    def init_grid(self) -> jnp.ndarray:
        return self.city.init_grid()

    def step(self, log_odds: jnp.ndarray, obs_b, extr_b,
             step_key: jnp.ndarray):
        """-> (log_odds', occupancy'), row-sharded over the mesh."""
        keys = jax.random.split(step_key, self.n_rigs)
        poses_b = self._poses(self.params, obs_b, extr_b, keys)
        cap = poses_b.position.shape[1]
        flat = jax.tree_util.tree_map(
            lambda x: x.reshape((self.n_rigs * cap,) + x.shape[2:]),
            poses_b)
        return self.city.update(log_odds, flat)
