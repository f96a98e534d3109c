"""Multi-fleet orchestration: independent fleets on disjoint submeshes.

The reference deploys one ROS node per vehicle; a TPU slice serving a
whole operation hosts MANY logical deployments at once — e.g. two
cities' fleets with different camera intrinsics, or a canary fleet on
new detector weights next to the production fleet. Each such deployment
is a `parallel.fleet.Fleet` pinned to its own contiguous device group:

  - device groups are DISJOINT, so the fleets share nothing — no
    collectives between groups, no interference beyond HBM/ICI they
    don't touch;
  - each fleet may carry its OWN GridVisionConfig and params (weights),
    so heterogeneous configs coexist in one process / one jit cache;
  - `step_all` dispatches every fleet's jit back-to-back WITHOUT
    waiting: jax dispatch is async, so fleets on disjoint devices
    execute concurrently and the host pays one dispatch latency per
    fleet, not one round-trip per fleet.

No reference counterpart (SURVEY §2.2: the reference is single-process
single-GPU); this is the serving-scale layer on top of Fleet.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from ..config import GridVisionConfig
from ..types import Extrinsics, GridState, Obs
from .fleet import Fleet


class MultiFleet:
    """G independent fleets over G disjoint device groups.

    configs: one GridVisionConfig per fleet (heterogeneous allowed).
    rigs_per_fleet: rig count per fleet (must divide its group size).
    devices_per_fleet: group size; defaults to an even split of all
      local devices across fleets.
    params_list / extrinsics_list: optional per-fleet weights/extrinsics
      (e.g. a canary fleet on different weights).
    """

    def __init__(self, configs: Sequence[GridVisionConfig],
                 rigs_per_fleet: int,
                 devices_per_fleet: Optional[int] = None,
                 params_list: Optional[Sequence[Dict[str, Any]]] = None,
                 extrinsics_list: Optional[Sequence[Extrinsics]] = None,
                 seed: int = 0):
        devices = jax.devices()
        g = len(configs)
        if g == 0:
            raise ValueError("need at least one fleet config")
        per = devices_per_fleet or len(devices) // g
        if per <= 0 or g * per > len(devices):
            raise ValueError(
                f"{g} fleets x {per} devices exceeds {len(devices)}")
        self.device_groups = [
            tuple(devices[i * per:(i + 1) * per]) for i in range(g)]
        self.fleets: List[Fleet] = []
        for i, cfg in enumerate(configs):
            mesh = Mesh(np.array(self.device_groups[i]), ("rig",))
            self.fleets.append(Fleet(
                cfg, n_rigs=rigs_per_fleet, mesh=mesh,
                params=params_list[i] if params_list else None,
                extrinsics=extrinsics_list[i] if extrinsics_list else None,
                seed=seed + i))

    @property
    def n_fleets(self) -> int:
        return len(self.fleets)

    def init_states(self, seed: int = 0) -> List[GridState]:
        return [f.init_states(seed + 100 * i)
                for i, f in enumerate(self.fleets)]

    def shard_obs(self, obs_list: Sequence[Obs]) -> List[Obs]:
        return [f.shard_obs(o) for f, o in zip(self.fleets, obs_list)]

    def step_all(self, states_list: Sequence[GridState],
                 obs_list: Sequence[Obs]):
        """One tick of every fleet. All dispatches are issued before any
        result is touched (async dispatch -> concurrent execution on
        the disjoint groups). Returns (states_list, outs_list)."""
        results = [f(s, o) for f, s, o in
                   zip(self.fleets, states_list, obs_list)]
        return [r[0] for r in results], [r[1] for r in results]

    def run_all(self, states_list: Sequence[GridState],
                obs_list: Sequence[Obs], steps: int) -> List[GridState]:
        """`steps` fused ticks per fleet, one scan dispatch per fleet
        (Fleet.run), all in flight together."""
        return [f.run(s, o, steps) for f, s, o in
                zip(self.fleets, states_list, obs_list)]

    def telemetry(self, outs_list) -> Dict[str, Any]:
        """Aggregate per-fleet saturation telemetry (host-side ints)."""
        agg = {}
        for i, outs in enumerate(outs_list):
            sat = outs.saturation
            agg[f"fleet{i}"] = {
                "prenms_overflow": int(np.asarray(
                    sat.prenms_overflow).sum()),
                "orientation_clamped": int(np.asarray(
                    sat.orientation_clamped).sum()),
                "orientation_dropped": int(np.asarray(
                    sat.orientation_dropped).sum()),
                "boxes": int(np.asarray(
                    outs.boxes.valid).sum()),
            }
        return agg
