"""Streaming replay: the 10 Hz sequence harness (BASELINE.json configs[3]).

Replaces the reference's 50 ms wall timer + DDS ingest loop
(src/grid_vision_node.cpp:49-50, 79-106) with a host loop that:
  - pulls the latest frames from native mailboxes (or a SyntheticScene),
  - packs clouds to the fixed-capacity layout (native fast path),
  - double-buffers: transfers obs t+1 while step t executes on device
    (jax dispatch is async, so device_put + the previous step overlap),
  - records per-stage wall timings (the reference's RCLCPP_INFO stage
    timers, SURVEY §5 'tracing').
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, List, Optional

import jax
import numpy as np

from ..config import GridVisionConfig
from ..io.scene import SyntheticScene
from ..pipeline import Engine
from ..types import GridState, Obs, PointCloud
from ..utils.stats import StepStats


def obs_from_scene(scene: SyntheticScene, t: float,
                   cfg: GridVisionConfig) -> Obs:
    obs, _ = obs_from_scene_with_stats(scene, t, cfg)
    return obs


def obs_from_scene_with_stats(scene: SyntheticScene, t: float,
                              cfg: GridVisionConfig):
    """obs_from_scene + host-side ingest telemetry: the number of finite
    cloud points dropped by the capacity subsample (SaturationStats'
    host-side sibling; see types.PointCloud.pack_numpy)."""
    import jax.numpy as jnp
    xyz = scene.cloud_at(t)
    cloud, dropped = PointCloud.pack_numpy(xyz, None, cfg.max_points)
    img = jnp.asarray(scene.image_at(t))
    return Obs(image=img, cloud=cloud, has_image=jnp.asarray(True),
               has_cloud=jnp.asarray(True)), dropped


@dataclasses.dataclass
class ReplayResult:
    n_steps: int
    wall_s: float
    stats: List[StepStats]
    final_state: GridState

    @property
    def achieved_hz(self) -> float:
        return self.n_steps / self.wall_s if self.wall_s > 0 else 0.0


def replay(engine: Engine, scene: SyntheticScene, n_steps: int,
           hz: float = 10.0, realtime: bool = False,
           on_step: Optional[Callable] = None,
           prefetch: int = 2) -> ReplayResult:
    """Run a temporal sequence through the engine.

    realtime=False free-runs (throughput mode); realtime=True paces the
    loop at `hz` like the reference's wall timer, overwriting stale
    frames (latest-wins) if the device is slower than the sensor.

    Host scene generation/packing overlaps device compute: a background
    thread keeps `prefetch` observations in flight (jax dispatch is
    async, so the device executes step t while the host builds t+1..).
    """
    import concurrent.futures

    cfg = engine.cfg
    state = engine.init_state()
    period = 1.0 / hz

    stats: List[StepStats] = []
    with concurrent.futures.ThreadPoolExecutor(max_workers=1) as pool:
        futures = {
            i: pool.submit(obs_from_scene_with_stats, scene, i * period,
                           cfg)
            for i in range(min(prefetch, n_steps))
        }
        t_start = time.perf_counter()
        for i in range(n_steps):
            obs, cloud_dropped = futures.pop(i).result()
            j = i + prefetch
            if j < n_steps:
                futures[j] = pool.submit(obs_from_scene_with_stats, scene,
                                         j * period, cfg)
            t0 = time.perf_counter()
            state, out = engine(state, obs)   # async dispatch
            t_dispatch = time.perf_counter() - t0
            if on_step is not None:
                on_step(i, state, out)
            stats.append(StepStats(step=i, dispatch_s=t_dispatch,
                                   cloud_points_dropped=cloud_dropped))
            if realtime:
                sleep = (i + 1) * period - (time.perf_counter() - t_start)
                if sleep > 0:
                    time.sleep(sleep)
        jax.block_until_ready(state.log_odds)
        wall = time.perf_counter() - t_start
    return ReplayResult(n_steps=n_steps, wall_s=wall, stats=stats,
                        final_state=state)
