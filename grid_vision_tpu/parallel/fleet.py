"""Rig fleet: N independent sensor rigs stepping in parallel.

Implements BASELINE.json configs[4] ("64 simulated sensor rigs stepping
independent grids in parallel"): ``jax.vmap`` of the fused pipeline step
over a leading rig axis, sharded over a 1D ``rig`` mesh with
NamedSharding. Each rig's GridState stays resident on its device between
steps (donated buffers), observations stream in rig-sharded — zero
cross-device collectives per step, which is the whole point: the
reference's one-node-per-rig ROS deployment becomes one jit on one slice.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import pipeline
from ..config import GridVisionConfig
from ..types import Extrinsics, GridState, Obs
from .mesh import rig_mesh


class Fleet:
    """vmap(step) over rigs, sharded over devices."""

    def __init__(self, cfg: GridVisionConfig, n_rigs: int,
                 mesh: Optional[Mesh] = None,
                 params: Optional[Dict[str, Any]] = None,
                 extrinsics: Optional[Extrinsics] = None, seed: int = 0):
        cfg.validate()
        self.cfg = cfg
        self.n_rigs = n_rigs
        self.mesh = mesh or rig_mesh()
        n_dev = self.mesh.devices.size
        if n_rigs % n_dev:
            raise ValueError(f"n_rigs {n_rigs} % devices {n_dev} != 0")

        engine = pipeline.Engine(cfg, extrinsics=extrinsics, params=params,
                                 seed=seed)
        self.params = engine.params
        self.extrinsics = engine.extrinsics

        rig_sharding = NamedSharding(self.mesh, P("rig"))
        repl = NamedSharding(self.mesh, P())
        self._rig_sharding = rig_sharding
        self._repl = repl

        vstep = jax.vmap(
            functools.partial(pipeline.step, cfg=cfg),
            in_axes=(None, 0, 0, None))
        self._step = jax.jit(
            vstep,
            in_shardings=(repl,
                          jax.tree_util.tree_map(lambda _: rig_sharding,
                                                 self._state_struct()),
                          None, repl),
            donate_argnums=(1,),
        )
        self._compacted: Dict[int, Any] = {}
        self._tracked: Dict[Any, Any] = {}
        self._forecast: Dict[Any, Any] = {}

    def _make_compacted(self, budget_per_rig: int):
        """The PRODUCTION compacted path (pipeline.fleet_step), mesh-
        sharded: each device runs ONE batched detector invocation over
        its LOCAL rigs — the un-vmapped path the fused Pallas stem
        (detector_stem_backend='pallas') dispatches on, where the plain
        vmap(step) above falls back to the XLA stem (the BatchTracer
        guard in pipeline._detector_input). The orientation budget and
        crop compaction apply PER SHARD (local load-proportionality;
        still zero cross-device collectives)."""
        try:
            from jax import shard_map
        except ImportError:          # older jax
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec
        local = self.n_rigs // self.mesh.devices.size
        budget = budget_per_rig * local
        cfg = self.cfg
        rig = PartitionSpec("rig")
        rep = PartitionSpec()

        # check_vma=False: the fleet path has NO collectives by design,
        # and interpret-mode pallas_call (the CPU test/dryrun path)
        # cannot thread varying-manual-axes through its internal grid
        # loop — jax's own suggested workaround for that limitation
        @functools.partial(jax.jit, donate_argnums=(1,))
        @functools.partial(
            shard_map, mesh=self.mesh,
            in_specs=(rep, rig, rig, rep),
            out_specs=(rig, rig), check_vma=False)
        def step_c(params, states, obs, extr):
            return pipeline.fleet_step(params, states, obs, extr, cfg,
                                       orientation_budget=budget)

        return step_c

    def compacted_step(self, states: GridState, obs_batch: Obs,
                       budget_per_rig: int = 5):
        """One fleet tick through pipeline.fleet_step per shard (fleet-
        compacted orientation batching; the bench headline path). Equal
        to __call__ when the budget covers the shard's dynamic load
        (tests/test_parallel.py)."""
        fn = self._compacted.get(budget_per_rig)
        if fn is None:
            fn = self._compacted[budget_per_rig] = self._make_compacted(
                budget_per_rig)
        return fn(self.params, states, obs_batch, self.extrinsics)

    # -- per-rig multi-object tracking (ops/tracking.py extension) --------
    def init_tracks(self, tcfg=None):
        """Stacked per-rig TrackStates, rig-sharded."""
        from ..ops import tracking
        tcfg = tcfg or tracking.TrackConfig()
        one = tracking.TrackState.create(tcfg)
        stacked = jax.tree_util.tree_map(
            lambda x: jnp.stack([x] * self.n_rigs), one)
        return jax.device_put(
            stacked,
            jax.tree_util.tree_map(lambda _: self._rig_sharding, stacked))

    def tracked_step(self, states: GridState, tracks, obs_batch: Obs,
                     dt=0.05, tcfg=None):
        """vmap(pipeline.step_tracked) over rigs: each rig carries its
        own track table (ids are per-rig streams). Same zero-collective
        sharding as __call__. Returns (states, tracks, outs, stats)."""
        from ..ops import tracking
        tcfg = tcfg or tracking.TrackConfig()
        fn = self._tracked.get(tcfg)
        if fn is None:
            vstep = jax.vmap(
                functools.partial(pipeline.step_tracked, cfg=self.cfg,
                                  tcfg=tcfg),
                in_axes=(None, 0, 0, 0, None, None))
            fn = self._tracked[tcfg] = jax.jit(vstep,
                                               donate_argnums=(1, 2))
        return fn(self.params, states, tracks, obs_batch,
                  self.extrinsics, jnp.asarray(dt, jnp.float32))

    def forecast(self, tracks, horizons, tcfg=None):
        """Predictive occupancy per rig: ops/tracking.forecast_occupancy
        vmapped over the rig axis, exported int8 0..100 on the same
        raster as occupancy_i8 (probability x 100, the nav_msgs
        convention). Called at PUBLISH cadence by `serve --forecast` —
        its cost scales with consumers, not the tick rate. Returns
        (R, K, H, W) int8 for K horizons (seconds)."""
        from ..ops import tracking
        tcfg = tcfg or tracking.TrackConfig()
        key = (tuple(float(h) for h in horizons), tcfg)
        fn = self._forecast.get(key)
        if fn is None:
            cfg = self.cfg

            def one(tr):
                p = tracking.forecast_occupancy(tr, key[0], cfg, tcfg)
                return jnp.round(p * 100.0).astype(jnp.int8)

            fn = self._forecast[key] = jax.jit(jax.vmap(one))
        return fn(tracks)

    def _state_struct(self):
        return GridState.create(self.cfg)

    def init_states(self, seed: int = 0) -> GridState:
        """Stacked per-rig states, rig-sharded. Each rig gets its own
        PRNG stream."""
        stacked = GridState.create_batch(self.cfg, self.n_rigs, seed)
        return jax.device_put(
            stacked,
            jax.tree_util.tree_map(lambda _: self._rig_sharding, stacked))

    def shard_obs(self, obs_batch: Obs) -> Obs:
        return jax.device_put(
            obs_batch,
            jax.tree_util.tree_map(lambda _: self._rig_sharding, obs_batch))

    def __call__(self, states: GridState, obs_batch: Obs):
        """states/obs_batch have leading rig axis. Returns (states, outs)."""
        return self._step(self.params, states, obs_batch, self.extrinsics)

    def run(self, states: GridState, obs_batch: Obs, steps: int):
        """Sustained mode: `steps` fused ticks on the SAME observations
        inside one dispatch (lax.scan) — the deployment shape for
        maximum throughput (per-dispatch overhead amortized to zero).
        Returns the final states; per-step outputs are not materialized.
        """
        import functools

        @functools.partial(jax.jit, donate_argnums=(1,),
                           static_argnums=(3,))
        def chunk(params, states, obs, n, extr):
            def body(s, _):
                vstep = jax.vmap(
                    functools.partial(pipeline.step, cfg=self.cfg),
                    in_axes=(None, 0, 0, None))
                s2, _out = vstep(params, s, obs, extr)
                return s2, ()
            states, _ = jax.lax.scan(body, states, None, length=n)
            return states

        return chunk(self.params, states, obs_batch, steps,
                     self.extrinsics)

    # -- checkpoint / resume (the whole fleet's grids) --------------------
    def save_states(self, states: GridState, path: str) -> None:
        from ..utils import checkpoint
        checkpoint.save(path, states)

    def restore_states(self, path: str) -> GridState:
        from ..utils import checkpoint
        like = GridState.create_batch(self.cfg, self.n_rigs)
        states = checkpoint.restore(path, like)
        return jax.device_put(
            states,
            jax.tree_util.tree_map(lambda _: self._rig_sharding, states))
