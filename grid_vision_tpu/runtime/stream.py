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
import jax.numpy as jnp
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


def packed_from_scene(scene: SyntheticScene, t: float,
                      cfg: GridVisionConfig):
    """Render + pack one observation into the single-transfer wire
    buffer (types.Obs.pack_bytes). Returns (np.uint8 buffer, dropped)."""
    xyz = scene.cloud_at(t)
    out_xyz, out_int, n, dropped = PointCloud.pack_host(
        xyz, None, cfg.max_points)
    img = np.clip(scene.image_at(t), 0, 255).astype(np.uint8)
    buf = Obs.pack_bytes(img, out_xyz, out_int, n, True, n > 0, cfg)
    return buf, dropped


class PackedDeltaEncoder:
    """Host-side ROI-delta wire encoder (types.pack_delta_bytes).

    encode() diffs the new frame against the DECODER-VISIBLE
    reconstruction (the carried previous frame with only the emitted
    ROIs patched in — exactly what types.unpack_delta holds on device);
    if every changed pixel fits the fixed ROI window
    (types.delta_roi_shape) it emits a delta record (~4x fewer image
    bytes), otherwise a keyframe (the full Obs.pack_bytes buffer). The
    first frame is always a keyframe, and one is forced every
    `keyframe_interval` records so sub-threshold residual (bounded at
    `threshold` grey levels per pixel by the reconstruction diff —
    never accumulating) is periodically squashed to zero. Pixel
    changes below `threshold` grey levels are treated as static
    (sensor noise must not force keyframes).

    Encoding is inherently sequential: each record's diff depends on
    what the decoder reconstructed from all prior records. Callers
    must encode in frame order on one thread (prefetch workers should
    render frames; the consumer loop encodes — see replay_delta)."""

    def __init__(self, cfg: GridVisionConfig, threshold: int = 2,
                 keyframe_interval: int = 64):
        from ..types import delta_roi_shape
        if cfg.wire_image_codec != "rgb8":
            raise ValueError("ROI-delta wire requires "
                             "wire_image_codec='rgb8'")
        self.cfg = cfg
        self.threshold = threshold
        self.keyframe_interval = keyframe_interval
        self.roi_h, self.roi_w = delta_roi_shape(cfg)
        self._recon: Optional[np.ndarray] = None
        self._since_key = 0
        self.keyframes = 0
        self.deltas = 0

    def encode(self, img_u8: np.ndarray, xyz: np.ndarray,
               inten: np.ndarray, count: int, has_image: bool,
               has_cloud: bool):
        """Encode one frame against the decoder-visible reconstruction.
        -> (keyframe: bool, buf)."""
        from ..types import pack_delta_bytes
        cfg = self.cfg
        img_u8 = np.ascontiguousarray(img_u8, np.uint8)
        fits = False
        y0 = x0 = 0
        due = (self._recon is None
               or self._since_key >= self.keyframe_interval)
        if not due:
            diff = np.abs(img_u8.astype(np.int16)
                          - self._recon.astype(np.int16)).max(axis=-1)
            ys, xs = np.nonzero(diff > self.threshold)
            if ys.size == 0:
                y0 = x0 = 0
                fits = True
            elif (ys.max() - ys.min() < self.roi_h
                    and xs.max() - xs.min() < self.roi_w):
                # clamp the window inside the frame
                y0 = min(int(ys.min()), img_u8.shape[0] - self.roi_h)
                x0 = min(int(xs.min()), img_u8.shape[1] - self.roi_w)
                fits = True
        if fits:
            roi = img_u8[y0:y0 + self.roi_h, x0:x0 + self.roi_w]
            # mirror the device decoder: patch ONLY the ROI into the
            # carried reconstruction (types.unpack_delta)
            self._recon[y0:y0 + self.roi_h, x0:x0 + self.roi_w] = roi
            self._since_key += 1
            self.deltas += 1
            return False, pack_delta_bytes(roi, y0, x0, xyz, inten,
                                           count, has_image, has_cloud,
                                           cfg)
        self._recon = img_u8.copy()
        self._since_key = 0
        self.keyframes += 1
        return True, Obs.pack_bytes(img_u8, xyz, inten, count,
                                    has_image, has_cloud, cfg)


def replay_delta(engine: Engine, scene: SyntheticScene, n_steps: int,
                 hz: float = 10.0, prefetch: int = 8,
                 workers: int = 2) -> ReplayResult:
    """Per-frame realtime-capable replay over the ROI-delta wire
    (Engine.call_packed_delta): same output semantics as `replay`
    (every frame published, one dispatch per frame), ~4x fewer wire
    bytes per delta record. Prefetch workers render/pack frames; the
    consumer loop runs the (sequential, reconstruction-carrying)
    encoder — so the counters and the decoder-visible diff are both
    single-threaded. The returned ReplayResult carries the
    keyframe/delta split via the encoder counters (delta_encoder
    attribute)."""
    import concurrent.futures

    cfg = engine.cfg
    period = 1.0 / hz
    enc = PackedDeltaEncoder(cfg)

    def gen(i: int):
        xyz = scene.cloud_at(i * period)
        ox, oi, n, dropped = PointCloud.pack_host(xyz, None,
                                                  cfg.max_points)
        img = np.clip(scene.image_at(i * period), 0, 255).astype(np.uint8)
        return img, ox, oi, n, dropped

    state = engine.init_state()
    prev = jnp.zeros((cfg.camera_image_height, cfg.camera_image_width,
                      3), jnp.uint8)
    stats: List[StepStats] = []
    with concurrent.futures.ThreadPoolExecutor(
            max_workers=workers) as pool:
        futures = {i: pool.submit(gen, i)
                   for i in range(min(prefetch, n_steps))}
        t_start = time.perf_counter()
        for i in range(n_steps):
            img, ox, oi, n, dropped = futures.pop(i).result()
            key, buf = enc.encode(img, ox, oi, n, True, n > 0)
            j = i + prefetch
            if j < n_steps:
                futures[j] = pool.submit(gen, j)
            t0 = time.perf_counter()
            state, prev, _out = engine.call_packed_delta(
                state, prev, jnp.asarray(buf), keyframe=key)
            stats.append(StepStats(step=i,
                                   dispatch_s=time.perf_counter() - t0,
                                   cloud_points_dropped=dropped))
        _ = float(np.asarray(jax.device_get(
            state.log_odds.reshape(-1)[0])))
        wall = time.perf_counter() - t_start
    res = ReplayResult(n_steps=n_steps, wall_s=wall, stats=stats,
                       final_state=state)
    res.delta_encoder = enc
    return res


def replay_chunked(engine: Engine, scene: SyntheticScene, n_steps: int,
                   hz: float = 10.0, chunk: int = 8, prefetch: int = 4,
                   workers: int = 2) -> ReplayResult:
    """Throughput-mode sequence replay: K packed frames per transfer,
    one scan dispatch per chunk (Engine.call_packed_chunk). Use when the
    host link is latency-bound and K frames of output delay are
    acceptable; `replay` (per-frame) is the realtime-capable path."""
    import concurrent.futures

    cfg = engine.cfg
    period = 1.0 / hz
    n_chunks = max(n_steps // chunk, 1)

    def gen(ci: int):
        bufs = [packed_from_scene(scene, (ci * chunk + j) * period, cfg)[0]
                for j in range(chunk)]
        return np.stack(bufs)

    state = engine.init_state()
    stats: List[StepStats] = []
    with concurrent.futures.ThreadPoolExecutor(max_workers=workers) as pool:
        futures = {i: pool.submit(gen, i)
                   for i in range(min(prefetch, n_chunks))}
        t_start = time.perf_counter()
        for i in range(n_chunks):
            buf = futures.pop(i).result()
            j = i + prefetch
            if j < n_chunks:
                futures[j] = pool.submit(gen, j)
            t0 = time.perf_counter()
            state, _outs = engine.call_packed_chunk(state, jnp.asarray(buf))
            stats.append(StepStats(
                step=i * chunk, dispatch_s=time.perf_counter() - t0,
                cloud_points_dropped=0))
        _ = float(np.asarray(jax.device_get(
            state.log_odds.reshape(-1)[0])))
        wall = time.perf_counter() - t_start
    return ReplayResult(n_steps=n_chunks * chunk, wall_s=wall,
                        stats=stats, final_state=state)


def replay_ring(engine: Engine, scene: SyntheticScene, n_steps: int,
                hz: float = 10.0, chunk: int = 8,
                ring: int = 64) -> ReplayResult:
    """Ingest-rate measurement: pre-pack `ring` frames, then stream
    `n_steps` frames from the ring through the chunked packed path.

    This isolates what the ENGINE can ingest (host->device wire +
    unpack + fused step) from the cost of synthesizing the frames — a
    deployed rig receives camera/LiDAR frames from hardware; it does not
    ray-trace them. `replay`/`replay_chunked` include the synthetic
    renderer and therefore under-report ingest capability whenever
    rendering is slower than the device (see docs/PERF.md streaming
    section)."""
    cfg = engine.cfg
    period = 1.0 / hz
    ring = max(ring, chunk)
    bufs = np.stack([packed_from_scene(scene, i * period, cfg)[0]
                     for i in range(ring)])
    n_chunks = max(n_steps // chunk, 1)
    state = engine.init_state()
    t_start = time.perf_counter()
    for i in range(n_chunks):
        lo = (i * chunk) % (ring - chunk + 1)
        state, _outs = engine.call_packed_chunk(
            state, jnp.asarray(bufs[lo:lo + chunk]))
    _ = float(np.asarray(jax.device_get(
        state.log_odds.reshape(-1)[0])))
    wall = time.perf_counter() - t_start
    return ReplayResult(n_steps=n_chunks * chunk, wall_s=wall, stats=[],
                        final_state=state)


def replay(engine: Engine, scene: SyntheticScene, n_steps: int,
           hz: float = 10.0, realtime: bool = False,
           on_step: Optional[Callable] = None,
           prefetch: int = 8, packed: bool = True,
           workers: int = 2) -> ReplayResult:
    """Run a temporal sequence through the engine.

    realtime=False free-runs (throughput mode); realtime=True paces the
    loop at `hz` like the reference's wall timer, overwriting stale
    frames (latest-wins) if the device is slower than the sensor.

    packed=True (default) streams each frame as ONE uint8 wire buffer
    (rgb8 image + packed cloud, ~4.5x fewer bytes and 6x fewer transfers
    than typed f32 arrays) consumed by the jitted unpack+step; the
    worker pool keeps `prefetch` frames in flight so rendering, the
    host->device copies, and device compute all overlap (jax dispatch is
    async). packed=False keeps the typed-Obs path (used by tests that
    inject observations directly).
    """
    import concurrent.futures

    cfg = engine.cfg
    state = engine.init_state()
    period = 1.0 / hz
    gen = (packed_from_scene if packed else obs_from_scene_with_stats)
    call = (engine.call_packed if packed else engine)

    stats: List[StepStats] = []
    with concurrent.futures.ThreadPoolExecutor(max_workers=workers) as pool:
        futures = {
            i: pool.submit(gen, scene, i * period, cfg)
            for i in range(min(prefetch, n_steps))
        }
        t_start = time.perf_counter()
        for i in range(n_steps):
            obs, cloud_dropped = futures.pop(i).result()
            j = i + prefetch
            if j < n_steps:
                futures[j] = pool.submit(gen, scene, j * period, cfg)
            t0 = time.perf_counter()
            state, out = call(state, obs)   # async dispatch
            t_dispatch = time.perf_counter() - t0
            if on_step is not None:
                on_step(i, state, out)
            stats.append(StepStats(step=i, dispatch_s=t_dispatch,
                                   cloud_points_dropped=cloud_dropped))
            if realtime:
                sleep = (i + 1) * period - (time.perf_counter() - t_start)
                if sleep > 0:
                    time.sleep(sleep)
        # Scalar readback, not block_until_ready: on this machine's
        # tunnel backend block_until_ready returns before the work is
        # done (CLAUDE.md), which would overstate achieved_hz.
        _ = float(np.asarray(jax.device_get(
            state.log_odds.reshape(-1)[0])))
        wall = time.perf_counter() - t_start
    return ReplayResult(n_steps=n_steps, wall_s=wall, stats=stats,
                        final_state=state)


# ---------------------------------------------------------------------------
# adaptive wire selection (round 5, VERDICT r4 #7)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class WirePlan:
    """The adaptive gate's decision record for one link + workload.

    The ROI-delta wire trades host encoder CPU (~diff + pack per frame)
    for wire bytes. On a fast link the bytes don't bind and the encoder
    time is pure loss (measured on this machine's 92 MB/s tunnel:
    delta 64.6 Hz vs full 77.5 — docs/PERF.md round-4 note); on a slow
    link the bytes dominate and delta wins. The closed-form crossover:

        delta wins  <=>  (bytes_full - bytes_delta) / bw  >  encode_s
                    <=>  bw  <  (bytes_full - bytes_delta) / encode_s

    where bytes_delta is the keyframe-mix expectation measured on real
    frames of THIS scene (content-dependent: the ROI only fits when the
    frame-to-frame change is localized)."""

    mode: str                     # "delta" | "full"
    link_bw_bytes_s: float        # measured (probe_link_bandwidth)
    bytes_full: int               # one full packed frame on this cfg
    bytes_delta_expected: float   # keyframe-mix expectation
    keyframe_frac: float
    encode_s: float               # host encoder seconds per frame
    crossover_bw_bytes_s: float   # below this bandwidth, delta wins
    est_hz_full: float            # transfer-bound estimates (device
    est_hz_delta: float           # compute overlaps; dispatch cancels)


def probe_link_bandwidth(reps: int = 5, big: int = 8 << 20,
                         small: int = 1 << 12) -> float:
    """Measure host->device link bandwidth (bytes/s).

    Two-size probe: timing one transfer measures bandwidth + fixed
    round-trip latency; timing two sizes and differencing cancels the
    RTT (which is large and variable on this machine's tunnel —
    CLAUDE.md). Each probe chains a tiny on-device reduce and reads the
    scalar back, because on the axon backend block_until_ready does not
    synchronize. Median over reps resists the tunnel's intermittent
    degradation windows."""
    reduce = jax.jit(lambda x: x.astype(jnp.uint32).sum())

    def t_of(nbytes: int) -> float:
        buf = np.ones(nbytes, np.uint8)
        _ = int(jax.device_get(reduce(jnp.asarray(buf))))  # warm compile
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = int(jax.device_get(reduce(jnp.asarray(buf))))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_big, t_small = t_of(big), t_of(small)
    return max(float(big - small) / max(t_big - t_small, 1e-6), 1.0)


def plan_wire(cfg: GridVisionConfig, scene: SyntheticScene,
              link_bw_bytes_s: float, sample: int = 16,
              hz: float = 10.0) -> WirePlan:
    """Choose full-frame vs ROI-delta wire for this link and scene.

    Runs the real encoder over `sample` rendered frames to measure its
    host cost and the expected keyframe/delta byte mix (both are
    content-dependent), then applies the closed-form crossover above.
    Pure host work — safe to run while the device is busy. A non-rgb8
    wire codec has no delta encoder: the plan is 'full' with a zero
    crossover."""
    period = 1.0 / hz
    if cfg.wire_image_codec != "rgb8":
        xyz = scene.cloud_at(0.0)
        ox, oi, n, _ = PointCloud.pack_host(xyz, None, cfg.max_points)
        img = np.clip(scene.image_at(0.0), 0, 255).astype(np.uint8)
        bytes_full = len(Obs.pack_bytes(img, ox, oi, n, True, n > 0, cfg))
        return WirePlan(
            mode="full", link_bw_bytes_s=float(link_bw_bytes_s),
            bytes_full=int(bytes_full),
            bytes_delta_expected=float(bytes_full), keyframe_frac=1.0,
            encode_s=0.0, crossover_bw_bytes_s=0.0,
            est_hz_full=float(link_bw_bytes_s) / bytes_full,
            est_hz_delta=float(link_bw_bytes_s) / bytes_full)
    enc = PackedDeltaEncoder(cfg)
    total_bytes = 0.0
    t_enc = 0.0
    bytes_full = None
    for i in range(sample):
        xyz = scene.cloud_at(i * period)
        ox, oi, n, _ = PointCloud.pack_host(xyz, None, cfg.max_points)
        img = np.clip(scene.image_at(i * period), 0, 255).astype(np.uint8)
        if bytes_full is None:
            bytes_full = len(
                Obs.pack_bytes(img, ox, oi, n, True, n > 0, cfg))
        t0 = time.perf_counter()
        _key, buf = enc.encode(img, ox, oi, n, True, n > 0)
        t_enc += time.perf_counter() - t0
        total_bytes += len(buf)
    encode_s = t_enc / sample
    bytes_delta = total_bytes / sample
    kf = enc.keyframes / max(enc.keyframes + enc.deltas, 1)
    saved = max(float(bytes_full) - bytes_delta, 0.0)
    crossover = saved / max(encode_s, 1e-9)
    est_full = 1.0 / max(bytes_full / link_bw_bytes_s, 1e-9)
    est_delta = 1.0 / max(bytes_delta / link_bw_bytes_s + encode_s, 1e-9)
    return WirePlan(
        mode="delta" if link_bw_bytes_s < crossover else "full",
        link_bw_bytes_s=float(link_bw_bytes_s),
        bytes_full=int(bytes_full),
        bytes_delta_expected=float(bytes_delta),
        keyframe_frac=float(kf),
        encode_s=float(encode_s),
        crossover_bw_bytes_s=float(crossover),
        est_hz_full=float(est_full),
        est_hz_delta=float(est_delta),
    )


def replay_auto(engine: Engine, scene: SyntheticScene, n_steps: int,
                hz: float = 10.0, link_bw_bytes_s: float | None = None,
                **kw):
    """Per-frame replay with the wire chosen by plan_wire.

    Probes the link unless a bandwidth is given, plans against THIS
    scene's content, then dispatches to replay (full frames) or
    replay_delta (ROI-delta records). Returns (plan, ReplayResult)."""
    if link_bw_bytes_s is None:
        link_bw_bytes_s = probe_link_bandwidth()
    plan = plan_wire(engine.cfg, scene, link_bw_bytes_s, hz=hz)
    if plan.mode == "delta":
        res = replay_delta(engine, scene, n_steps, hz=hz, **kw)
    else:
        res = replay(engine, scene, n_steps, hz=hz, **kw)
    return plan, res
