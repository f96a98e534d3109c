"""Multi-object tracking: persistent object identity + velocity.

The reference has NO temporal object state: every tick it republishes
anonymous markers with 0.1-0.2 s lifetimes (publishObjectVisualizations,
/root/reference/src/grid_vision_node.cpp:405-523) and identity exists
only as RViz afterglow. Any consumer that needs "the same car as last
frame" (prediction, planning, counting) must re-derive it. This module
adds that capability as a pure-additive extension: nothing in the
reference-parity outputs (boxes / poses / grid) changes — the tracker
consumes a finished StepOutput and maintains its own state.

Design (TPU-first, everything inside the jit):
  - TrackState is a fixed-capacity masked slot table (the same padded-
    pytree discipline as every other jit-crossing type, types.py).
  - Association is greedy best-IoU matching between velocity-predicted
    track boxes and the frame's detections (SORT-style; Hungarian's
    optimality matters at IoU ties we don't care about). The greedy
    argmax loop is a lax.fori_loop over a (T, D) score matrix — tiny
    next to the conv workload.
  - 3D state (base-frame position + velocity) comes from the step's own
    pose estimates: dynamic boxes from LShapePoses, static boxes from
    the kNN-depth static_points. Velocity is an EMA of frame-to-frame
    position deltas; unmatched tracks coast on it.
  - Track ids are monotonically assigned from a carried counter; slot
    reuse is deterministic (free slots fill lowest-index-first with
    unmatched detections in confidence order), so results are
    reproducible and scan/vmap-safe.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..config import GridVisionConfig
from ..taxonomy import is_dynamic
from ..types import StepOutput, pytree_dataclass


@dataclasses.dataclass(frozen=True)
class TrackConfig:
    """Static tracker configuration (hashable; closed over by the jit).

    capacity: track slot count T (padded table size).
    iou_min: minimum predicted-box IoU to accept a match.
    class_gated: require label equality for a match (a car detection
      never extends a person track).
    max_misses: consecutive unmatched frames before a track stops being
      reported (it coasts on its velocity until then).
    min_hits: matches needed before a track counts as confirmed
      (suppresses one-frame false positives in confirmed()).
    purgatory: extra frames past max_misses a LOST track is retained
      for motion-gated re-acquisition before its slot is freed. A lost
      track is invisible to consumers (confirmed() excludes it) and no
      longer competes in IoU matching (its pixel box is stale), but it
      keeps coasting in 3D; an unmatched detection whose 3D position
      falls inside the track's miss-scaled gate resumes the SAME id.
      Occlusion episodes in the MOT replays run ~12 frames — longer
      than any sane max_misses — and were the dominant IDSW source
      (docs/QUALITY.md tracking section). 0 disables (round-4
      behavior: kill at max_misses).
    reacq_radius / reacq_radius_rate: 3D re-acquisition gate
      radius(t_lost) = reacq_radius + reacq_radius_rate * t_lost
      meters, t_lost = misses * dt — constant-velocity prediction
      error grows with time, so the gate does too.
    occl_coast_iou: a lost track stays REPORTED through purgatory while
      its coasted box overlaps a nearer reported track's box above this
      IoU (occlusion evidence: the object is behind the occluder, not
      gone). Identity then persists through the occlusion episode
      instead of flickering out at max_misses and back at
      re-acquisition. 0 disables (lost tracks always hidden).
    spawn_confidence: minimum detection confidence to open a new track.
    pos_gain / vel_gain: alpha-beta filter gains for the 3D state —
      position takes pos_gain of the innovation, velocity integrates
      vel_gain/dt of it. (Round 3 used an EMA of raw frame-to-frame
      position deltas; with sigma of pose noise that carries
      sigma*sqrt(2)/dt of velocity noise — ~4 m/s at 20 Hz and 15 cm —
      the same order as real targets, which made velocity-projected
      forecasts WORSE than persistence. The filter's measured velocity
      noise is ~5x lower at equal responsiveness:
      train/eval_tracking.forecast_calibration.)
    box_vel_alpha: EMA weight for the pixel-space box velocity
      (matching only; 1.0 = always take the newest frame delta).
    """

    capacity: int = 32
    iou_min: float = 0.3
    class_gated: bool = True
    max_misses: int = 5
    min_hits: int = 2
    spawn_confidence: float = 0.0
    pos_gain: float = 0.5
    vel_gain: float = 0.1
    box_vel_alpha: float = 0.5
    purgatory: int = 40
    reacq_radius: float = 1.5
    reacq_radius_rate: float = 2.0
    occl_coast_iou: float = 0.0
    match_depth_scale: float = 2.0


@pytree_dataclass
class TrackState:
    """Padded track table (slot-indexed; `id` is the stable identity).

    xyxy: (T, 4) last matched/coasted box, pixel space.
    vel_px: (T, 4) d(xyxy)/dt EMA — predicts the next box for matching.
    position: (T, 3) base-frame position (pose/static-point source).
    velocity: (T, 3) base-frame m/s EMA.
    quat/length/width/height: (T, ...) last matched 3D box attributes.
    label: (T,) int32; confidence: (T,) last matched confidence.
    id: (T,) int32 stable track id (monotonic, never reused).
    hits / misses / age: (T,) int32 match count, consecutive miss count,
      steps since spawn.
    valid: (T,) bool live-slot mask; has_pose: (T,) bool whether
      position/velocity carry live 3D state.
    next_id: () int32 id counter.
    """

    xyxy: jnp.ndarray
    vel_px: jnp.ndarray
    position: jnp.ndarray
    velocity: jnp.ndarray
    quat: jnp.ndarray
    length: jnp.ndarray
    width: jnp.ndarray
    height: jnp.ndarray
    label: jnp.ndarray
    confidence: jnp.ndarray
    id: jnp.ndarray
    hits: jnp.ndarray
    misses: jnp.ndarray
    age: jnp.ndarray
    valid: jnp.ndarray
    has_pose: jnp.ndarray
    next_id: jnp.ndarray

    @staticmethod
    def create(tcfg: TrackConfig) -> "TrackState":
        t = tcfg.capacity
        z = lambda *s: jnp.zeros(s, jnp.float32)
        zi = lambda *s: jnp.zeros(s, jnp.int32)
        return TrackState(
            xyxy=z(t, 4), vel_px=z(t, 4), position=z(t, 3),
            velocity=z(t, 3),
            quat=jnp.zeros((t, 4), jnp.float32).at[:, 3].set(1.0),
            length=z(t), width=z(t), height=z(t),
            label=jnp.full((t,), 10, jnp.int32), confidence=z(t),
            id=jnp.full((t,), -1, jnp.int32),
            hits=zi(t), misses=zi(t), age=zi(t),
            valid=jnp.zeros((t,), bool), has_pose=jnp.zeros((t,), bool),
            next_id=jnp.zeros((), jnp.int32),
        )

    @property
    def capacity(self) -> int:
        return self.xyxy.shape[-2]

    def confirmed(self, tcfg: TrackConfig) -> jnp.ndarray:
        """(T,) bool: live tracks with enough history to trust.

        LOST tracks (misses > max_misses) are normally excluded: a slot
        coasting in re-acquisition purgatory is tracker-internal state,
        not a reportable object — its stale box must not render,
        forecast, or count as a false positive. The one exception
        (occl_coast_iou > 0) is a lost track whose coasted box still
        heavily overlaps a NEARER reported track: the overlap is
        occlusion evidence (the object is hidden behind the occluder,
        not gone), so identity keeps being reported through the episode
        instead of flickering out and back. The gate is self-limiting —
        the moment the coasted box slides off the occluder (object and
        occluder diverge, or the coast drifts) reporting stops."""
        live = self.valid & (self.hits >= tcfg.min_hits)
        reported = live & (self.misses <= tcfg.max_misses)
        if tcfg.purgatory > 0 and tcfg.occl_coast_iou > 0.0:
            lost = live & (self.misses > tcfg.max_misses) & self.has_pose
            iou = cross_iou(self.xyxy, self.xyxy)
            dist = jnp.linalg.norm(self.position, axis=-1)
            occluder = (reported[None, :] & self.has_pose[None, :]
                        & (dist[None, :] < dist[:, None])
                        & (iou > tcfg.occl_coast_iou))
            reported |= lost & jnp.any(occluder, axis=1)
        return reported


@pytree_dataclass
class TrackStats:
    """Per-step tracker telemetry, () int32 each (the tracking sibling
    of types.SaturationStats)."""

    matched: jnp.ndarray
    spawned: jnp.ndarray
    killed: jnp.ndarray
    spawn_dropped: jnp.ndarray  # unmatched detections lost to a full table
    reacquired: jnp.ndarray     # lost tracks resumed by the 3D gate


def cross_iou(a_xyxy: jnp.ndarray, b_xyxy: jnp.ndarray) -> jnp.ndarray:
    """(T, 4) x (D, 4) -> (T, D) IoU (same denominator convention as
    ops.nms.pairwise_iou / computeIoU_Eigen,
    /root/reference/src/object_detection.cpp:148-164)."""
    x1 = jnp.maximum(a_xyxy[:, None, 0], b_xyxy[None, :, 0])
    y1 = jnp.maximum(a_xyxy[:, None, 1], b_xyxy[None, :, 1])
    x2 = jnp.minimum(a_xyxy[:, None, 2], b_xyxy[None, :, 2])
    y2 = jnp.minimum(a_xyxy[:, None, 3], b_xyxy[None, :, 3])
    inter = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    area_a = (a_xyxy[:, 2] - a_xyxy[:, 0]) * (a_xyxy[:, 3] - a_xyxy[:, 1])
    area_b = (b_xyxy[:, 2] - b_xyxy[:, 0]) * (b_xyxy[:, 3] - b_xyxy[:, 1])
    denom = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(denom > 0, inter / jnp.where(denom == 0, 1.0, denom),
                     0.0)


def greedy_match(score: jnp.ndarray):
    """Greedy one-to-one assignment on a (T, D) score matrix.

    Repeatedly takes the global argmax among still-unmatched pairs with
    score > 0 (ineligible pairs must be pre-masked to <= 0). Returns
    (tmatch (T,) int32 det index or -1, dmatch (D,) int32 track index or
    -1). A while_loop bounded by min(T, D) iterations but exiting as
    soon as no positive score remains: each pass is a serialized
    argmax+scatter over T*D lanes, and real frames match ~5 objects,
    not capacity — a fixed fori_loop pays the full min(T, D) latency
    every step (its tail iterations are provably no-ops: once
    max(s) <= 0, ok is False and the carry is unchanged, so the early
    exit is result-identical; under vmap the batched while runs until
    every lane is done).
    """
    t, d = score.shape
    rows = jnp.arange(t, dtype=jnp.int32)
    cols = jnp.arange(d, dtype=jnp.int32)

    def cond(carry):
        s, tm, dm, n = carry
        return (n < min(t, d)) & (jnp.max(s) > 0.0)

    def body(carry):
        s, tm, dm, n = carry
        flat = jnp.argmax(s).astype(jnp.int32)
        i, j = flat // d, flat % d
        ok = s.reshape(-1)[flat] > 0.0
        tm = tm.at[i].set(jnp.where(ok, j, tm[i]))
        dm = dm.at[j].set(jnp.where(ok, i, dm[j]))
        dead = (rows[:, None] == i) | (cols[None, :] == j)
        s = jnp.where(ok & dead, -1.0, s)
        return s, tm, dm, n + 1

    _, tmatch, dmatch, _ = jax.lax.while_loop(
        cond, body,
        (score, jnp.full((t,), -1, jnp.int32),
         jnp.full((d,), -1, jnp.int32), jnp.zeros((), jnp.int32)))
    return tmatch, dmatch


def per_box_pose(out: StepOutput, cfg: GridVisionConfig):
    """Align the step's 3D estimates to detection-box slots.

    Returns (position (D, 3), quat (D, 4), dims (D, 3) lwh,
    has_pose (D,)) in base frame, one row per box slot of out.boxes:
      - static boxes take static_points (kNN median depth back-
        projection; markers-only in the reference, quirk Q6) — but only
        where static_depths carries a real measurement: a -1.0 sentinel
        (no cloud overlap / max_static_depth compaction) back-projects
        BEHIND the camera and must not become track state;
      - dynamic boxes take out.poses. In vision mode the poses are the
        compacted dynamic batch (pipeline._compact_dynamic order —
        deterministic in the boxes, so it can be recomputed here and
        scattered back); in PCA mode poses are already box-aligned. The
        mode is read from cfg.use_vision_orientation (NOT inferred from
        capacities: max_orientation_batch == max_detections is a legal
        vision config where a capacity heuristic would silently treat
        the permuted dynamic batch as box-slot-aligned).
    """
    boxes = out.boxes
    d = boxes.capacity
    poses = out.poses
    if not cfg.use_vision_orientation:
        # PCA path: pose slot i corresponds to box slot i.
        pos, quat = poses.position, poses.quat
        dims = jnp.stack([poses.length, poses.width, poses.height], -1)
        hasp = poses.valid
    else:
        # Vision path: scatter the compacted batch back to box slots
        # using the same deterministic order _compact_dynamic used.
        dyn = boxes.valid & is_dynamic(boxes.label)
        order = jnp.argsort(~dyn).astype(jnp.int32)[:poses.capacity]
        pos = jnp.zeros((d, 3), jnp.float32).at[order].set(poses.position)
        quat = (jnp.zeros((d, 4), jnp.float32).at[:, 3].set(1.0)
                .at[order].set(poses.quat))
        dims = jnp.zeros((d, 3), jnp.float32).at[order].set(
            jnp.stack([poses.length, poses.width, poses.height], -1))
        hasp = jnp.zeros((d,), bool).at[order].set(poses.valid)
    static = out.static_boxes.valid
    static_measured = static & (out.static_depths > 0.0)
    pos = jnp.where(static[:, None], out.static_points, pos)
    quat = jnp.where(static[:, None],
                     jnp.zeros((d, 4), jnp.float32).at[:, 3].set(1.0), quat)
    dims = jnp.where(static[:, None], 0.0, dims)
    hasp = jnp.where(static, static_measured, hasp)
    return pos, quat, dims, hasp


def update_tracks(tracks: TrackState, out: StepOutput, dt,
                  cfg: GridVisionConfig, tcfg: TrackConfig,
                  match_fn=None):
    """One tracker tick: predict -> match -> update/coast/kill -> spawn.

    Pure function of (tracks, out, dt); returns (TrackState, TrackStats).
    dt may be a traced scalar (variable frame spacing) or a python
    float. Safe under vmap (per-rig fleets) and lax.scan (chunked
    replay).

    match_fn: assignment function with greedy_match's contract
    ((T, D) score -> (tmatch, dmatch)); defaults to greedy_match (the
    production path). train.eval_tracking.hungarian_match is the
    optimal drop-in used to bound greedy's cost in the MOT A/B
    (docs/QUALITY.md tracking section).
    """
    if match_fn is None:
        match_fn = greedy_match
    dt = jnp.asarray(dt, jnp.float32)
    inv_dt = 1.0 / jnp.maximum(dt, 1e-6)
    boxes = out.boxes
    t_cap, d_cap = tracks.capacity, boxes.capacity

    det_pos, det_quat, det_dims, det_hasp = per_box_pose(out, cfg)

    # --- predict + match -------------------------------------------------
    pred_xyxy = tracks.xyxy + tracks.vel_px * dt
    iou = cross_iou(pred_xyxy, boxes.xyxy)
    # LOST tracks (in re-acquisition purgatory) sit out the IoU stage:
    # after max_misses frames of pixel-space coasting the predicted box
    # is stale enough to steal detections from live tracks. They can
    # only return through the 3D re-acquisition gate below.
    lost_pre = tracks.misses > tcfg.max_misses
    gate = (tracks.valid & ~lost_pre)[:, None] & boxes.valid[None, :]
    if tcfg.class_gated:
        gate &= tracks.label[:, None] == boxes.label[None, :]
    gate &= iou >= tcfg.iou_min
    score = iou
    if tcfg.match_depth_scale > 0.0:
        # 3D disambiguation: two same-class objects crossing in pixel
        # space overlap both predicted boxes (the IoU-only ID-swap
        # trap), but are depth-separated in 3D. Attenuate the IoU score
        # by the track-prediction-to-detection 3D distance where BOTH
        # sides carry a pose — pairs without pose keep the pure-IoU
        # score, and the gate (iou >= iou_min) is unchanged, so this
        # only reorders eligible pairs, never adds or removes any.
        pred_pos = tracks.position + tracks.velocity * dt
        d3 = jnp.linalg.norm(pred_pos[:, None, :] - det_pos[None, :, :],
                             axis=-1)
        both = tracks.has_pose[:, None] & det_hasp[None, :]
        score = jnp.where(both,
                          iou * jnp.exp(-d3 / tcfg.match_depth_scale),
                          iou)
    # iou_min may be 0; bias scores positive so gated pairs are > 0.
    tmatch, dmatch = match_fn(jnp.where(gate, score + 1e-6, -1.0))
    matched = tmatch >= 0
    j = jnp.clip(tmatch, 0, d_cap - 1)          # det index per track slot

    # --- matched tracks: measurement update -------------------------------
    new_box = boxes.xyxy[j]
    vel_obs = (new_box - tracks.xyxy) * inv_dt
    # first re-observation (hits == 1): take the raw delta, no EMA warmup
    a_box = jnp.where(tracks.hits <= 1, 1.0, tcfg.box_vel_alpha)[:, None]
    vel_px_m = (1.0 - a_box) * tracks.vel_px + a_box * vel_obs
    d_hasp = det_hasp[j]
    can_v3 = tracks.has_pose & d_hasp
    # 3D state: alpha-beta filter — predict, then blend the innovation
    # into position (pos_gain) and velocity (vel_gain/dt). See the
    # TrackConfig docstring for why this replaced the raw-delta EMA.
    pred_pos3 = tracks.position + tracks.velocity * dt
    innov = det_pos[j] - pred_pos3
    # bootstrap: a track whose velocity is still zero takes the raw
    # frame delta once (exact for clean poses; the filter then corrects
    # the noisy case over ~1/vel_gain frames)
    first_v3 = can_v3 & (jnp.sum(jnp.abs(tracks.velocity), -1) == 0.0)
    v3_raw = (det_pos[j] - tracks.position) * inv_dt
    vel_ab = tracks.velocity + (tcfg.vel_gain * inv_dt) * innov
    vel3_m = jnp.where(can_v3[:, None],
                       jnp.where(first_v3[:, None], v3_raw, vel_ab),
                       tracks.velocity)
    pos_ab = pred_pos3 + tcfg.pos_gain * innov
    pos_m = jnp.where(d_hasp[:, None],
                      jnp.where((can_v3 & ~first_v3)[:, None], pos_ab,
                                det_pos[j]),
                      pred_pos3)
    hasp_m = tracks.has_pose | d_hasp

    # --- unmatched tracks: coast, then kill --------------------------------
    coast = tracks.valid & ~matched
    killed = coast & (tracks.misses + 1 > tcfg.max_misses + tcfg.purgatory)
    alive = (tracks.valid & ~killed)

    def pick(m, on_match, on_coast):
        m = m.reshape((-1,) + (1,) * (on_match.ndim - 1))
        return jnp.where(m, on_match, on_coast)

    upd = TrackState(
        xyxy=pick(matched, new_box, pred_xyxy),
        vel_px=pick(matched, vel_px_m, tracks.vel_px),
        position=pick(matched, pos_m,
                      tracks.position + tracks.velocity * dt),
        velocity=pick(matched, vel3_m, tracks.velocity),
        quat=pick(matched & d_hasp, det_quat[j], tracks.quat),
        length=pick(matched & d_hasp, det_dims[j, 0], tracks.length),
        width=pick(matched & d_hasp, det_dims[j, 1], tracks.width),
        height=pick(matched & d_hasp, det_dims[j, 2], tracks.height),
        label=tracks.label,
        confidence=pick(matched, boxes.confidence[j], tracks.confidence),
        id=tracks.id,
        hits=tracks.hits + matched.astype(jnp.int32),
        misses=jnp.where(matched, 0, tracks.misses
                         + coast.astype(jnp.int32)),
        age=tracks.age + tracks.valid.astype(jnp.int32),
        valid=alive,
        has_pose=pick(matched, hasp_m, tracks.has_pose),
        next_id=tracks.next_id,
    )

    # --- re-acquire lost tracks through the 3D motion gate ------------------
    # An occlusion episode longer than max_misses used to mint a new id
    # on re-emergence (IDSW). Here unmatched detections first try to
    # resume a LOST track: same class, detection 3D position within the
    # track's coasted constant-velocity prediction's miss-scaled gate.
    # Pure fixed-shape second greedy pass — scan/vmap-safe.
    dmatch2 = jnp.full((d_cap,), -1, jnp.int32)
    rematched = jnp.zeros((t_cap,), bool)
    if tcfg.purgatory > 0:
        lost_now = upd.valid & (upd.misses > tcfg.max_misses) \
            & upd.has_pose
        cand = boxes.valid & (dmatch < 0) & det_hasp \
            & (boxes.confidence >= tcfg.spawn_confidence)
        # upd.position already carries this frame's coast step, so it IS
        # the CV prediction at the detection's time.
        t_lost = upd.misses.astype(jnp.float32) * dt
        radius = tcfg.reacq_radius + tcfg.reacq_radius_rate * t_lost
        dist = jnp.linalg.norm(
            upd.position[:, None, :] - det_pos[None, :, :], axis=-1)
        rgate = lost_now[:, None] & cand[None, :]
        if tcfg.class_gated:
            rgate &= upd.label[:, None] == boxes.label[None, :]
        rgate &= dist < radius[:, None]
        tmatch2, dmatch2 = match_fn(
            jnp.where(rgate, radius[:, None] - dist + 1e-6, -1.0))
        rematched = tmatch2 >= 0
        j2 = jnp.clip(tmatch2, 0, d_cap - 1)
        # measurement update over the whole lost gap: position blends
        # the innovation at pos_gain; velocity corrects by the gap-mean
        # innovation rate at vel_gain (alpha-beta with dt = t_lost).
        innov2 = det_pos[j2] - upd.position
        gap = jnp.maximum(t_lost, dt)
        pos_r = upd.position + tcfg.pos_gain * innov2
        vel_r = upd.velocity + (tcfg.vel_gain / gap)[:, None] * innov2

        def re(field, value):
            m = rematched.reshape((-1,) + (1,) * (field.ndim - 1))
            return jnp.where(m, value, field)

        upd = TrackState(
            xyxy=re(upd.xyxy, boxes.xyxy[j2]),
            # pixel velocity is stale after the gap; restart from zero
            # (hits<=1 fast-relock doesn't apply — take the next frame
            # delta at box_vel_alpha like any established track)
            vel_px=re(upd.vel_px, jnp.zeros((t_cap, 4), jnp.float32)),
            position=re(upd.position, pos_r),
            velocity=re(upd.velocity, vel_r),
            quat=re(upd.quat, det_quat[j2]),
            length=re(upd.length, det_dims[j2, 0]),
            width=re(upd.width, det_dims[j2, 1]),
            height=re(upd.height, det_dims[j2, 2]),
            label=upd.label,
            confidence=re(upd.confidence, boxes.confidence[j2]),
            id=upd.id,
            hits=upd.hits + rematched.astype(jnp.int32),
            misses=jnp.where(rematched, 0, upd.misses),
            age=upd.age,
            valid=upd.valid,
            has_pose=upd.has_pose,
            next_id=upd.next_id,
        )

    # --- spawn unmatched detections into free slots ------------------------
    free = ~alive                                        # (T,)
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1   # rank among free
    n_free = jnp.sum(free.astype(jnp.int32))
    spawnable = (boxes.valid & (dmatch < 0) & (dmatch2 < 0)
                 & (boxes.confidence >= tcfg.spawn_confidence))
    n_spawnable = jnp.sum(spawnable.astype(jnp.int32))
    sp_key = jnp.where(spawnable, -boxes.confidence, jnp.inf)
    det_order = jnp.argsort(sp_key).astype(jnp.int32)    # conf desc, stable
    src = det_order[jnp.clip(free_rank, 0, d_cap - 1)]   # det idx per slot
    do = free & (free_rank < n_spawnable)                # (T,)
    n_spawned = jnp.minimum(n_spawnable, n_free)

    def put(field, value):
        m = do.reshape((-1,) + (1,) * (field.ndim - 1))
        return jnp.where(m, value, field)

    zero3 = jnp.zeros((t_cap, 3), jnp.float32)
    new = TrackState(
        xyxy=put(upd.xyxy, boxes.xyxy[src]),
        vel_px=put(upd.vel_px, jnp.zeros((t_cap, 4), jnp.float32)),
        position=put(upd.position, det_pos[src]),
        velocity=put(upd.velocity, zero3),
        quat=put(upd.quat, det_quat[src]),
        length=put(upd.length, det_dims[src, 0]),
        width=put(upd.width, det_dims[src, 1]),
        height=put(upd.height, det_dims[src, 2]),
        label=put(upd.label, boxes.label[src]),
        confidence=put(upd.confidence, boxes.confidence[src]),
        id=put(upd.id, tracks.next_id + free_rank),
        hits=put(upd.hits, jnp.ones((t_cap,), jnp.int32)),
        misses=put(upd.misses, jnp.zeros((t_cap,), jnp.int32)),
        age=put(upd.age, jnp.zeros((t_cap,), jnp.int32)),
        valid=upd.valid | do,
        has_pose=put(upd.has_pose, det_hasp[src]),
        next_id=tracks.next_id + n_spawned,
    )
    stats = TrackStats(
        matched=jnp.sum(matched.astype(jnp.int32)),
        spawned=n_spawned,
        killed=jnp.sum(killed.astype(jnp.int32)),
        spawn_dropped=jnp.maximum(n_spawnable - n_free, 0),
        reacquired=jnp.sum(rematched.astype(jnp.int32)),
    )
    return new, stats


def forecast_occupancy(tracks: TrackState, horizons,
                       cfg: GridVisionConfig, tcfg: TrackConfig,
                       spread_base: float = 0.2,
                       spread_rate: float = 0.5,
                       survival_hazard: float = 0.32) -> jnp.ndarray:
    """Predictive occupancy: where tracked objects will be.

    The reference's grid (and this engine's compat grid) is purely
    reactive — occupancy appears where objects ARE. With tracked
    velocities the engine can also answer the planning question "which
    cells will be occupied at t + h?". For each horizon h, every
    confirmed track with live 3D state projects its yaw-aligned
    length x width footprint at position + velocity * h, softened by a
    positional uncertainty that grows with the horizon
    (sigma(h) = spread_base + spread_rate * h meters — constant-velocity
    model error growth) and discounted by exp(-survival_hazard * h) —
    the probability the prediction still binds at t + h at all (the
    object leaves, occludes, or the track's identity churns; without it
    interior cells saturate at ~1 while only ~0.70 of them materialize
    at 1 s — the round-4 top-bin overconfidence). The hazard was fit on
    the seed-0 MOT replay (empirical/predicted top-bin ratio is
    exp(-0.32 h) within a few percent at ALL of 0.5/1/2 s) and
    validated on held-out seeds 1-3: top-bin reliability gap 0.26 ->
    <= 0.1 at 1 s with skill vs persistence PRESERVED
    (train/eval_tracking.forecast_calibration; floors in
    tests/test_tracking.py). Per-cell probabilities combine as an
    independent union across tracks.

    horizons: static tuple/list of K floats (seconds).
    Returns (K, H, W) float32 in [0, 1] on the same grid raster as
    GridState (grid_map buffer order, geometry.grid_index_from_position).
    One fused XLA computation; safe inside jit/vmap.
    """
    from .rasterize import _cell_centers, yaw_from_quat

    h_cells, w_cells = cfg.grid_size
    rows = jax.lax.broadcasted_iota(jnp.int32, (h_cells, w_cells), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h_cells, w_cells), 1)
    centers = _cell_centers(rows, cols, cfg)              # (H, W, 2)

    active = tracks.confirmed(tcfg) & tracks.has_pose     # (T,)
    yaw = yaw_from_quat(tracks.quat)
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    hl = jnp.maximum(tracks.length / 2.0, 0.1)
    hw = jnp.maximum(tracks.width / 2.0, 0.1)

    def one_horizon(h):
        pred = tracks.position[:, :2] + tracks.velocity[:, :2] * h
        sigma = spread_base + spread_rate * h
        survive = math.exp(-survival_hazard * h)   # h is a static float
        rx = centers[None, ..., 0] - pred[:, 0, None, None]   # (T, H, W)
        ry = centers[None, ..., 1] - pred[:, 1, None, None]
        u = c[:, None, None] * rx + s[:, None, None] * ry
        v = -s[:, None, None] * rx + c[:, None, None] * ry
        # soft rectangle: ~1 inside, smooth roll-off over sigma meters
        pu = jax.nn.sigmoid((hl[:, None, None] - jnp.abs(u)) / sigma * 4.0)
        pv = jax.nn.sigmoid((hw[:, None, None] - jnp.abs(v)) / sigma * 4.0)
        p = survive * pu * pv * active[:, None, None].astype(jnp.float32)
        # independent union over tracks: 1 - prod(1 - p)
        return 1.0 - jnp.prod(1.0 - p, axis=0)

    return jnp.stack([one_horizon(float(h)) for h in horizons])
