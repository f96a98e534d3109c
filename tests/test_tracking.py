"""Multi-object tracker (ops/tracking.py) — extension; the reference has
no temporal object state (markers are regenerated anonymously each tick,
grid_vision_node.cpp:405-523).

Covers: greedy matching vs a NumPy oracle, id stability + 3D velocity
accuracy against scene ground truth through the production fuse path,
coast/kill lifecycle, spawn overflow telemetry, vision-mode pose
alignment (per_box_pose scatter), scan/vmap safety, Engine integration.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from grid_vision_tpu import pipeline
from grid_vision_tpu.config import GridVisionConfig
from grid_vision_tpu.demo import default_extrinsics, oracle_boxes, _R_CB
from grid_vision_tpu.io.scene import SyntheticScene
from grid_vision_tpu.ops import tracking
from grid_vision_tpu.ops.tracking import (TrackConfig, TrackState,
                                          greedy_match, update_tracks)
from grid_vision_tpu.runtime.stream import obs_from_scene
from grid_vision_tpu.types import (Boxes, LShapePoses, SaturationStats,
                                   StepOutput)


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _np_greedy_match(score):
    """Literal NumPy transcription of tracking.greedy_match."""
    s = np.array(score, np.float32, copy=True)
    t, d = s.shape
    tm = np.full((t,), -1, np.int32)
    dm = np.full((d,), -1, np.int32)
    for _ in range(min(t, d)):
        i, j = np.unravel_index(np.argmax(s), s.shape)
        if s[i, j] <= 0.0:
            break
        tm[i], dm[j] = j, i
        s[i, :] = -1.0
        s[:, j] = -1.0
    return tm, dm


def _boxes(rows, capacity=16):
    """rows: list of (xyxy, conf, label)."""
    xyxy = np.zeros((capacity, 4), np.float32)
    conf = np.zeros((capacity,), np.float32)
    label = np.full((capacity,), 10, np.int32)
    valid = np.zeros((capacity,), bool)
    for i, (bb, c, lb) in enumerate(rows):
        xyxy[i], conf[i], label[i], valid[i] = bb, c, lb, True
    return Boxes(xyxy=jnp.asarray(xyxy), confidence=jnp.asarray(conf),
                 label=jnp.asarray(label), valid=jnp.asarray(valid))


def _output(boxes, positions=None, static_valid=None):
    """Minimal StepOutput with PCA-aligned poses at the given base-frame
    positions (valid where boxes are valid unless positions is None)."""
    cap = boxes.capacity
    if positions is None:
        pos = np.zeros((cap, 3), np.float32)
        pvalid = np.zeros((cap,), bool)
    else:
        pos = np.zeros((cap, 3), np.float32)
        pos[:len(positions)] = positions
        pvalid = np.asarray(boxes.valid)
    poses = LShapePoses(
        position=jnp.asarray(pos),
        quat=jnp.zeros((cap, 4), jnp.float32).at[:, 3].set(1.0),
        length=jnp.full((cap,), 4.0, jnp.float32),
        width=jnp.full((cap,), 1.8, jnp.float32),
        height=jnp.full((cap,), 1.4, jnp.float32),
        label=boxes.label, valid=jnp.asarray(pvalid))
    sb_valid = (jnp.zeros((cap,), bool) if static_valid is None
                else jnp.asarray(static_valid))
    static_boxes = Boxes(xyxy=boxes.xyxy, confidence=boxes.confidence,
                         label=boxes.label, valid=sb_valid)
    return StepOutput(
        boxes=boxes, poses=poses,
        static_points=jnp.zeros((cap, 3), jnp.float32),
        # valid static boxes carry a measured depth; everything else the
        # reference -1.0 sentinel (tracker must ignore those slots)
        static_depths=jnp.where(sb_valid, 5.0, -1.0),
        static_boxes=static_boxes,
        occupancy_i8=jnp.zeros((8, 8), jnp.int8),
        saturation=SaturationStats.zeros())


CFG = GridVisionConfig(use_vision_orientation=False)


# ---------------------------------------------------------------------------
# matching
# ---------------------------------------------------------------------------

def test_greedy_match_oracle(rng):
    for _ in range(20):
        t, d = int(rng.integers(1, 12)), int(rng.integers(1, 20))
        score = rng.uniform(-1, 1, (t, d)).astype(np.float32)
        tm, dm = jax.jit(greedy_match)(jnp.asarray(score))
        tm_np, dm_np = _np_greedy_match(score)
        np.testing.assert_array_equal(np.asarray(tm), tm_np)
        np.testing.assert_array_equal(np.asarray(dm), dm_np)
        # one-to-one: every matched det points back at its track
        for i, j in enumerate(tm_np):
            if j >= 0:
                assert dm_np[j] == i


def test_match_is_class_gated():
    tcfg = TrackConfig(capacity=4)
    tracks = TrackState.create(tcfg)
    out0 = _output(_boxes([([10, 10, 50, 50], 0.9, 9)]),
                   positions=[[5, 0, 0]])
    tracks, _ = jax.jit(functools.partial(
        update_tracks, cfg=CFG, tcfg=tcfg))(tracks, out0, 0.1)
    # same box, different class -> no match: old track misses, new spawns
    out1 = _output(_boxes([([10, 10, 50, 50], 0.9, 2)]),
                   positions=[[5, 0, 0]])
    tracks, stats = jax.jit(functools.partial(
        update_tracks, cfg=CFG, tcfg=tcfg))(tracks, out1, 0.1)
    assert int(stats.matched) == 0
    assert int(stats.spawned) == 1
    assert int(jnp.sum(tracks.valid)) == 2


# ---------------------------------------------------------------------------
# lifecycle
# ---------------------------------------------------------------------------

def test_coast_and_kill():
    # purgatory=0 pins the pre-reacquisition lifecycle: kill AT
    # max_misses (test_reacquisition_* cover purgatory > 0)
    tcfg = TrackConfig(capacity=4, max_misses=3, min_hits=1, purgatory=0)
    upd = jax.jit(functools.partial(update_tracks, cfg=CFG, tcfg=tcfg))
    tracks = TrackState.create(tcfg)
    # two observations moving +20 px/frame in x to establish velocity
    for k in range(2):
        bb = [10 + 20 * k, 10, 50 + 20 * k, 50]
        tracks, _ = upd(tracks, _output(_boxes([(bb, 0.9, 9)]),
                                        positions=[[5 + k, 0, 0]]), 1.0)
    assert int(jnp.sum(tracks.valid)) == 1
    tid = int(tracks.id[np.asarray(tracks.valid).argmax()])
    vel = np.asarray(tracks.vel_px)[np.asarray(tracks.valid).argmax()]
    np.testing.assert_allclose(vel, [20, 0, 20, 0], atol=1e-4)
    empty = _output(_boxes([]))
    # coasts for max_misses frames: box moves by vel_px, pos by velocity
    for k in range(3):
        tracks, stats = upd(tracks, empty, 1.0)
        assert int(jnp.sum(tracks.valid)) == 1, f"died too early at {k}"
        assert int(stats.killed) == 0
        i = np.asarray(tracks.valid).argmax()
        assert int(tracks.misses[i]) == k + 1
        np.testing.assert_allclose(
            np.asarray(tracks.xyxy)[i],
            np.asarray([10 + 20, 10, 50 + 20, 50])
            + np.asarray([20, 0, 20, 0]) * (k + 1), atol=1e-3)
        assert np.asarray(tracks.position)[i, 0] > 5.9  # coasted forward
    tracks, stats = upd(tracks, empty, 1.0)
    assert int(stats.killed) == 1
    assert int(jnp.sum(tracks.valid)) == 0
    # a later spawn gets a FRESH id (ids are never reused)
    tracks, _ = upd(tracks, _output(_boxes([([10, 10, 50, 50], 0.9, 9)])),
                    1.0)
    assert int(tracks.id[np.asarray(tracks.valid).argmax()]) > tid


def test_reacquisition_keeps_id():
    """A track lost past max_misses is re-acquired through the 3D
    motion gate with the SAME id (no IDSW) while it stays invisible to
    confirmed() during the purgatory window."""
    tcfg = TrackConfig(capacity=4, max_misses=2, min_hits=1,
                       purgatory=10)
    upd = jax.jit(functools.partial(update_tracks, cfg=CFG, tcfg=tcfg))
    tracks = TrackState.create(tcfg)
    # two observations at 1 m/s in x establish the 3D velocity
    for k in range(2):
        tracks, _ = upd(tracks, _output(
            _boxes([([10, 10, 50, 50], 0.9, 9)]),
            positions=[[5.0 + k, 0, 0]]), 1.0)
    i = int(np.asarray(tracks.valid).argmax())
    tid = int(tracks.id[i])
    # occlusion: 5 empty frames — past max_misses, inside purgatory
    empty = _output(_boxes([]))
    for k in range(5):
        tracks, stats = upd(tracks, empty, 1.0)
        assert int(stats.killed) == 0
        assert int(jnp.sum(tracks.valid)) == 1  # slot retained
        if int(tracks.misses[i]) > tcfg.max_misses:
            assert not bool(tracks.confirmed(tcfg)[i])  # lost: hidden
    # re-emerge near the constant-velocity prediction (pos [12,0,0]
    # after this frame's coast), with a drifted pixel box that would
    # fail any IoU gate — only the 3D gate can resume it
    out = _output(_boxes([([300, 10, 340, 50], 0.9, 9)]),
                  positions=[[11.5, 0, 0]])
    tracks, stats = upd(tracks, out, 1.0)
    assert int(stats.reacquired) == 1
    assert int(stats.spawned) == 0
    assert int(jnp.sum(tracks.valid)) == 1
    assert int(tracks.id[i]) == tid            # identity preserved
    assert int(tracks.misses[i]) == 0
    assert bool(tracks.confirmed(tcfg)[i])     # reportable again
    np.testing.assert_allclose(np.asarray(tracks.xyxy)[i],
                               [300, 10, 340, 50], atol=1e-3)


def test_reacquisition_class_and_radius_gated():
    tcfg = TrackConfig(capacity=4, max_misses=1, min_hits=1,
                       purgatory=10, reacq_radius=1.0,
                       reacq_radius_rate=0.0)
    upd = jax.jit(functools.partial(update_tracks, cfg=CFG, tcfg=tcfg))

    def lose_one():
        tr = TrackState.create(tcfg)
        for k in range(2):
            tr, _ = upd(tr, _output(_boxes([([10, 10, 50, 50], 0.9, 9)]),
                                    positions=[[5.0, 0, 0]]), 1.0)
        for _ in range(3):       # static object, now lost (misses 3 > 1)
            tr, _ = upd(tr, _output(_boxes([])), 1.0)
        return tr, int(tr.id[int(np.asarray(tr.valid).argmax())])

    # wrong class inside the radius: spawns a NEW track instead
    tracks, tid = lose_one()
    out = _output(_boxes([([10, 10, 50, 50], 0.9, 2)]),
                  positions=[[5.0, 0, 0]])
    tracks, stats = upd(tracks, out, 1.0)
    assert int(stats.reacquired) == 0 and int(stats.spawned) == 1
    # right class outside the radius: also a new track
    tracks, tid = lose_one()
    out = _output(_boxes([([10, 10, 50, 50], 0.9, 9)]),
                  positions=[[8.0, 0, 0]])
    tracks, stats = upd(tracks, out, 1.0)
    assert int(stats.reacquired) == 0 and int(stats.spawned) == 1


def test_purgatory_expiry_kills():
    tcfg = TrackConfig(capacity=4, max_misses=1, min_hits=1, purgatory=3)
    upd = jax.jit(functools.partial(update_tracks, cfg=CFG, tcfg=tcfg))
    tracks = TrackState.create(tcfg)
    tracks, _ = upd(tracks, _output(_boxes([([10, 10, 50, 50], 0.9, 9)]),
                                    positions=[[5.0, 0, 0]]), 1.0)
    empty = _output(_boxes([]))
    for k in range(4):           # misses 1..4 <= max_misses + purgatory
        tracks, stats = upd(tracks, empty, 1.0)
        assert int(stats.killed) == 0
    tracks, stats = upd(tracks, empty, 1.0)   # misses 5 > 4: expire
    assert int(stats.killed) == 1
    assert int(jnp.sum(tracks.valid)) == 0


def test_match_depth_disambiguates_crossing():
    """Two same-class tracks whose predicted boxes both overlap both
    detections (a pixel-space crossing) are assigned by 3D proximity
    when match_depth_scale > 0 — the ID-swap trap the pure-IoU matcher
    falls into (MOT A/B: aggregate IDSW 251 -> 185, IDF1 0.576 ->
    0.658; docs/QUALITY.md)."""
    tcfg = TrackConfig(capacity=4, min_hits=1, iou_min=0.1)
    upd = jax.jit(functools.partial(update_tracks, cfg=CFG, tcfg=tcfg))
    tracks = TrackState.create(tcfg)
    # two stationary tracks at the same pixel box but different depths
    out = _output(_boxes([([10, 10, 50, 50], 0.9, 9),
                          ([12, 10, 52, 50], 0.9, 9)]),
                  positions=[[5.0, 0, 0], [15.0, 0, 0]])
    tracks, _ = upd(tracks, out, 1.0)
    ids = np.asarray(tracks.id)[np.asarray(tracks.valid)]
    near_id, far_id = (int(ids[0]), int(ids[1]))
    # next frame: boxes nearly coincide; 3D positions stay separated.
    # Present the detections in SWAPPED slot order so a pure-IoU tie
    # would cross-assign.
    out2 = _output(_boxes([([12, 10, 52, 50], 0.9, 9),
                           ([10, 10, 50, 50], 0.9, 9)]),
                   positions=[[15.2, 0, 0], [5.1, 0, 0]])
    tracks, stats = upd(tracks, out2, 1.0)
    assert int(stats.matched) == 2
    pos = np.asarray(tracks.position)
    idarr = np.asarray(tracks.id)
    # the near track (id near_id) must still hold the ~5 m position
    i_near = int(np.flatnonzero(idarr == near_id)[0])
    i_far = int(np.flatnonzero(idarr == far_id)[0])
    assert abs(pos[i_near, 0] - 5.1) < 1.0, pos
    assert abs(pos[i_far, 0] - 15.2) < 1.0, pos


def test_occl_coast_reporting_gate():
    """With occl_coast_iou > 0 a LOST track stays confirmed while its
    coasted box overlaps a NEARER reported track (occlusion evidence),
    and drops out when the overlap ends. Default is 0 (off): the MOT
    A/B measured it negative on the replay suite (coasted boxes drift
    off the occluded GT: FP +66, IDF1 0.565 -> 0.560) — kept as a
    tested non-default mechanism."""
    tcfg = TrackConfig(capacity=4, max_misses=1, min_hits=1,
                       purgatory=10, occl_coast_iou=0.25, iou_min=0.1)
    upd = jax.jit(functools.partial(update_tracks, cfg=CFG, tcfg=tcfg))
    tracks = TrackState.create(tcfg)
    # far track (to be occluded) + near occluder, same pixel region
    out = _output(_boxes([([10, 10, 50, 50], 0.9, 9),
                          ([8, 8, 52, 52], 0.9, 9)]),
                  positions=[[20.0, 0, 0], [6.0, 0, 0]])
    tracks, _ = upd(tracks, out, 1.0)
    far = int(np.asarray(jnp.argmax(tracks.position[:, 0])))
    # occluder keeps being detected; far object vanishes behind it
    occ_only = _output(_boxes([([8, 8, 52, 52], 0.9, 9)]),
                       positions=[[6.0, 0, 0]])
    for _ in range(3):            # misses 1..3 > max_misses=1: LOST
        tracks, _ = upd(tracks, occ_only, 1.0)
    assert int(tracks.misses[far]) > tcfg.max_misses
    assert bool(tracks.confirmed(tcfg)[far])          # occluded: kept
    # with the gate off it is hidden (the shipped default)
    assert not bool(tracks.confirmed(
        TrackConfig(capacity=4, max_misses=1, min_hits=1, purgatory=10,
                    occl_coast_iou=0.0, iou_min=0.1))[far])
    # occluder slides away (staying IoU-matched each step) until its
    # box no longer overlaps the far track's coast -> reporting stops
    for x0 in (30, 60, 110):
        moved = _output(_boxes([([x0, 8, x0 + 44, 52], 0.9, 9)]),
                        positions=[[6.0, 0.5, 0]])
        tracks, stats = upd(tracks, moved, 1.0)
        assert int(stats.matched) == 1
    assert not bool(tracks.confirmed(tcfg)[far])


def test_spawn_overflow_and_priority():
    tcfg = TrackConfig(capacity=4)
    rows = [([10 + 60 * i, 10, 50 + 60 * i, 50], 0.9 - 0.1 * i, 9)
            for i in range(6)]
    tracks, stats = jax.jit(functools.partial(
        update_tracks, cfg=CFG, tcfg=tcfg))(
        TrackState.create(tcfg), _output(_boxes(rows)), 0.1)
    assert int(stats.spawned) == 4
    assert int(stats.spawn_dropped) == 2
    # the four HIGHEST-confidence detections won the slots
    confs = sorted(float(c) for c in np.asarray(tracks.confidence)
                   [np.asarray(tracks.valid)])
    np.testing.assert_allclose(confs, [0.6, 0.7, 0.8, 0.9], atol=1e-6)
    # ids are 0..3 in confidence order, slot order deterministic
    assert sorted(int(i) for i in np.asarray(tracks.id)
                  [np.asarray(tracks.valid)]) == [0, 1, 2, 3]
    assert int(tracks.next_id) == 4


# ---------------------------------------------------------------------------
# 3D alignment (vision-mode scatter) and velocity
# ---------------------------------------------------------------------------

def test_per_box_pose_vision_alignment():
    """Vision-mode poses (compacted capacity < box capacity) scatter back
    to the right box slots: dynamic boxes in confidence-stable order."""
    cap = 8
    boxes = _boxes([([0, 0, 10, 10], 0.9, 5),     # static (light)
                    ([20, 0, 30, 10], 0.8, 9),    # dynamic
                    ([40, 0, 50, 10], 0.7, 2)],   # dynamic
                   capacity=cap)
    pcap = 4
    pos = np.zeros((pcap, 3), np.float32)
    pos[0] = [1, 2, 3]    # first compacted dynamic = box slot 1
    pos[1] = [4, 5, 6]    # second = box slot 2
    poses = LShapePoses(
        position=jnp.asarray(pos),
        quat=jnp.zeros((pcap, 4), jnp.float32).at[:, 3].set(1.0),
        length=jnp.ones((pcap,)), width=jnp.ones((pcap,)),
        height=jnp.ones((pcap,)),
        label=jnp.zeros((pcap,), jnp.int32),
        valid=jnp.asarray([True, True, False, False]))
    static_pts = np.zeros((cap, 3), np.float32)
    static_pts[0] = [7, 8, 9]
    out = StepOutput(
        boxes=boxes, poses=poses,
        static_points=jnp.asarray(static_pts),
        static_depths=jnp.asarray([5.0] + [-1.0] * (cap - 1)),
        static_boxes=Boxes(xyxy=boxes.xyxy, confidence=boxes.confidence,
                           label=boxes.label,
                           valid=jnp.asarray([True] + [False] * (cap - 1))),
        occupancy_i8=jnp.zeros((8, 8), jnp.int8),
        saturation=SaturationStats.zeros())
    vcfg = GridVisionConfig(use_vision_orientation=True)
    p, q, dims, hasp = jax.jit(functools.partial(
        tracking.per_box_pose, cfg=vcfg))(out)
    np.testing.assert_allclose(np.asarray(p)[0], [7, 8, 9])   # static point
    np.testing.assert_allclose(np.asarray(p)[1], [1, 2, 3])
    np.testing.assert_allclose(np.asarray(p)[2], [4, 5, 6])
    assert list(np.asarray(hasp)[:4]) == [True, True, True, False]


def test_id_stability_and_velocity_vs_ground_truth():
    """Production path: oracle boxes -> PCA poses -> tracker over a 5 Hz
    sequence. The two scene objects keep exactly two stable ids and the
    tracked base-frame velocity converges to the ground truth."""
    cfg = GridVisionConfig(use_vision_orientation=False)
    eng = pipeline.Engine(cfg, extrinsics=default_extrinsics(), seed=0)
    fuse = jax.jit(functools.partial(pipeline.fuse, cfg=cfg))
    tcfg = TrackConfig(min_hits=2)
    upd = jax.jit(functools.partial(update_tracks, cfg=cfg, tcfg=tcfg))

    scene = SyntheticScene(cfg, seed=7)
    scene.add_default_traffic()      # vehicle v=(0,0,-2), person v=(.5,0,0)
    state = eng.init_state()
    tracks = eng.init_tracks(tcfg)
    dt = 0.2
    ids_seen = set()
    n_frames = 16
    for f in range(n_frames):
        t = f * dt
        obs = obs_from_scene(scene, t, cfg)
        boxes = oracle_boxes(scene, t, cfg)
        state, out = fuse(eng.params, state, obs, boxes, eng.extrinsics)
        tracks, _ = upd(tracks, out, dt)
        conf = np.asarray(tracks.confirmed(tcfg))
        ids_seen.update(int(i) for i in np.asarray(tracks.id)[conf])
    assert len(ids_seen) == 2, f"expected 2 stable ids, saw {ids_seen}"
    conf = np.asarray(tracks.confirmed(tcfg))
    assert conf.sum() == 2
    # match each confirmed track to its GT object by label
    lbl = np.asarray(tracks.label)
    vel = np.asarray(tracks.velocity)
    hasp = np.asarray(tracks.has_pose)
    for obj in scene.objects:
        sel = conf & (lbl == obj.label)
        assert sel.sum() == 1
        i = sel.argmax()
        assert hasp[i]
        gt_base = _R_CB @ obj.velocity.astype(np.float32)
        err = np.linalg.norm(vel[i][:2] - gt_base[:2])
        assert err < 0.75, (f"label {obj.label}: tracked {vel[i][:2]} vs "
                            f"gt {gt_base[:2]} (err {err:.2f} m/s)")


# ---------------------------------------------------------------------------
# transform safety + Engine integration
# ---------------------------------------------------------------------------

def test_scan_equals_sequential():
    tcfg = TrackConfig(capacity=8)
    upd = functools.partial(update_tracks, cfg=CFG, tcfg=tcfg)
    frames = []
    for k in range(6):
        rows = [([10 + 15 * k, 10, 60 + 15 * k, 60], 0.9, 9)]
        if k >= 2:
            rows.append(([200, 100, 260, 160], 0.8, 2))
        frames.append(_output(_boxes(rows),
                              positions=[[5 + k, 0, 0]] * len(rows)))
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *frames)

    seq = TrackState.create(tcfg)
    for f in frames:
        seq, _ = jax.jit(upd)(seq, f, 0.1)

    def body(tr, o):
        tr2, st = upd(tr, o, 0.1)
        return tr2, st

    scanned, _ = jax.jit(lambda tr, fs: jax.lax.scan(body, tr, fs))(
        TrackState.create(tcfg), stacked)
    for a, b in zip(jax.tree_util.tree_leaves(seq),
                    jax.tree_util.tree_leaves(scanned)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)


def test_vmap_per_rig_tracking():
    tcfg = TrackConfig(capacity=8)
    upd = functools.partial(update_tracks, cfg=CFG, tcfg=tcfg)
    out_a = _output(_boxes([([10, 10, 60, 60], 0.9, 9)]),
                    positions=[[5, 0, 0]])
    out_b = _output(_boxes([([100, 10, 160, 60], 0.8, 2),
                            ([300, 200, 360, 260], 0.7, 0)]),
                    positions=[[8, 1, 0], [12, -2, 0]])
    outs = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), out_a, out_b)
    tr0 = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        TrackState.create(tcfg), TrackState.create(tcfg))
    trb, _ = jax.jit(jax.vmap(lambda tr, o: upd(tr, o, 0.1)))(tr0, outs)
    ta, _ = jax.jit(upd)(TrackState.create(tcfg), out_a, 0.1)
    tb, _ = jax.jit(upd)(TrackState.create(tcfg), out_b, 0.1)
    for leaf_b, la, lb in zip(jax.tree_util.tree_leaves(trb),
                              jax.tree_util.tree_leaves(ta),
                              jax.tree_util.tree_leaves(tb)):
        np.testing.assert_allclose(np.asarray(leaf_b[0]), np.asarray(la))
        np.testing.assert_allclose(np.asarray(leaf_b[1]), np.asarray(lb))


def _manual_track(position, velocity, length=4.0, width=2.0, yaw=0.0,
                  tcfg=TrackConfig()):
    """One confirmed track at the given base-frame state."""
    tr = TrackState.create(tcfg)

    def set0(x, v):
        return x.at[0].set(v)

    quat = np.array([0, 0, np.sin(yaw / 2), np.cos(yaw / 2)], np.float32)
    return TrackState(
        xyxy=set0(tr.xyxy, jnp.asarray([10, 10, 50, 50], jnp.float32)),
        vel_px=tr.vel_px,
        position=set0(tr.position, jnp.asarray(position, jnp.float32)),
        velocity=set0(tr.velocity, jnp.asarray(velocity, jnp.float32)),
        quat=set0(tr.quat, jnp.asarray(quat)),
        length=set0(tr.length, length), width=set0(tr.width, width),
        height=set0(tr.height, 1.5),
        label=set0(tr.label, 9), confidence=set0(tr.confidence, 0.9),
        id=set0(tr.id, 0),
        hits=set0(tr.hits, tcfg.min_hits), misses=tr.misses, age=tr.age,
        valid=set0(tr.valid, True), has_pose=set0(tr.has_pose, True),
        next_id=jnp.asarray(1, jnp.int32))


def test_forecast_occupancy_moves_with_velocity():
    from grid_vision_tpu.geometry import grid_index_from_position

    cfg = CFG
    tcfg = TrackConfig()
    tracks = _manual_track([10.0, 0.0, 0.0], [2.0, 0.0, 0.0])
    fc = jax.jit(functools.partial(
        tracking.forecast_occupancy, horizons=(0.0, 1.0, 2.0), cfg=cfg,
        tcfg=tcfg))(tracks)
    assert fc.shape == (3,) + cfg.grid_size
    fc = np.asarray(fc)
    assert fc.min() >= 0.0 and fc.max() <= 1.0
    length = (float(cfg.grid_x), float(cfg.grid_y))
    for k, h in enumerate((0.0, 1.0, 2.0)):
        expect = np.array([10.0 + 2.0 * h, 0.0])
        idx, ok = grid_index_from_position(
            jnp.asarray(expect, jnp.float32), cfg.grid_center, length,
            cfg.resolution)
        assert bool(ok)
        # the footprint interior saturates to 1.0 (a plateau), so locate
        # it by center of mass rather than argmax
        mass = fc[k] / fc[k].sum()
        r = float((mass.sum(1) * np.arange(mass.shape[0])).sum())
        c = float((mass.sum(0) * np.arange(mass.shape[1])).sum())
        er, ec = int(idx[0]), int(idx[1])
        assert abs(r - er) <= 2 and abs(c - ec) <= 2, (
            f"h={h}: mass center {(r, c)}, expected ~{(er, ec)}")
        # interior plateau = survival discount exp(-0.32 h) (the
        # round-5 calibration fix), within the sigmoid roll-off
        import math
        assert fc[k].max() > 0.9 * math.exp(-0.32 * h), (h, fc[k].max())
        assert fc[k].max() <= math.exp(-0.32 * h) + 1e-5
    # uncertainty grows with horizon: the footprint's effective support
    # (total mass / plateau height — the area of an equivalent hard
    # rectangle, invariant to the survival discount) spreads
    assert fc[2].sum() / fc[2].max() > fc[0].sum() / fc[0].max()
    # unconfirmed/empty table forecasts nothing
    fc0 = jax.jit(functools.partial(
        tracking.forecast_occupancy, horizons=(1.0,), cfg=cfg,
        tcfg=tcfg))(TrackState.create(tcfg))
    assert float(np.asarray(fc0).max()) == 0.0


def test_fleet_tracked_step():
    """Per-rig tracking over the 8-device mesh (Fleet.tracked_step)."""
    from grid_vision_tpu.parallel import Fleet
    from grid_vision_tpu.types import Obs, PointCloud, tree_stack

    tiny = GridVisionConfig(
        max_points=256, max_candidates=32, max_detections=8,
        max_orientation_batch=2, max_points_per_box=64,
        camera_image_height=64, camera_image_width=96,
        detection_network_input_size=32, network_height=32,
        network_width=32, ransac_iters=16, compute_dtype="float32",
        use_vision_orientation=False)
    n_rigs = 8
    fleet = Fleet(tiny, n_rigs=n_rigs, seed=0)
    tcfg = TrackConfig(capacity=8)
    states, tracks = fleet.init_states(), fleet.init_tracks(tcfg)
    rng = np.random.default_rng(0)
    obs = fleet.shard_obs(tree_stack([
        Obs(image=jnp.asarray(rng.uniform(0, 255, (64, 96, 3)),
                              jnp.float32),
            cloud=PointCloud.from_numpy(
                rng.uniform([-5, -2, 1], [5, 2, 30],
                            size=(128, 3)).astype(np.float32),
                None, tiny.max_points),
            has_image=jnp.asarray(True), has_cloud=jnp.asarray(True))
        for _ in range(n_rigs)]))
    states, tracks, outs, tstats = fleet.tracked_step(
        states, tracks, obs, dt=0.1, tcfg=tcfg)
    assert tracks.valid.shape == (n_rigs, tcfg.capacity)
    assert tstats.matched.shape == (n_rigs,)
    assert states.log_odds.shape == (n_rigs,) + tiny.grid_size
    # per-rig id streams: next_id is independent per rig
    assert tracks.next_id.shape == (n_rigs,)


def test_engine_call_tracked():
    cfg = GridVisionConfig(use_vision_orientation=False)
    eng = pipeline.Engine(cfg, extrinsics=default_extrinsics(), seed=0)
    state, tracks = eng.init_state(), eng.init_tracks()
    scene = SyntheticScene(cfg, seed=3)
    scene.add_default_traffic()
    for f in range(3):
        obs = obs_from_scene(scene, f * 0.1, cfg)
        state, tracks, out, tstats = eng.call_tracked(
            state, tracks, obs, dt=0.1)
    # random-init detector finds nothing; the tracker stays empty but the
    # fused call runs end-to-end and telemetry is well-formed
    assert int(jnp.sum(tracks.valid)) == int(tracks.next_id)
    assert int(tstats.matched) >= 0
    assert out.occupancy_i8.shape == cfg.grid_size


# ---------------------------------------------------------------------------
# sequence-level quality floors (train/eval_tracking.py MOT replays)
# ---------------------------------------------------------------------------

def test_mot_quality_floors():
    """CLEAR-MOT floors on the canonical scripted replay (crossings +
    Markov occlusion episodes + churn, 250 frames) through the
    production update_tracks. Floors are measured-minus-margin from
    docs/QUALITY.md's tracking table (seed 0 after round 5's purgatory
    re-acquisition + 3D-attenuated matching: MOTA 0.861, IDF1 0.614,
    44 IDSW, 98 FP, 38 FN of 1297 visible GT) — a regression that
    halves identity quality fails here."""
    from grid_vision_tpu.train import eval_tracking as et

    cfg = GridVisionConfig(use_vision_orientation=False)
    objs = et.make_crossing_scenario(0, 250)
    f = et.simulate(objs, cfg, 250, seed=0)
    snaps = et.run_tracker(f, cfg, TrackConfig())
    m = et.mot_metrics(f, snaps)
    assert m["n_gt"] > 1000                  # the replay is non-trivial
    assert m["mota"] >= 0.82, m
    assert m["idf1"] >= 0.55, m
    assert m["id_switches"] <= 60, m
    assert m["fp"] <= 120, m
    assert m["fn"] <= 60, m


def test_mot_greedy_matches_hungarian():
    """The production greedy matcher costs nothing vs the optimal
    (Hungarian) assignment on the canonical replay — the A/B that
    justifies not paying Hungarian's serialized cost in the jit
    (measured: greedy 0.867 MOTA / 0.658 IDF1 aggregate vs Hungarian
    0.868 / 0.639, docs/QUALITY.md)."""
    from grid_vision_tpu.train import eval_tracking as et

    cfg = GridVisionConfig(use_vision_orientation=False)
    objs = et.make_crossing_scenario(1, 200)
    f = et.simulate(objs, cfg, 200, seed=1)
    mg = et.mot_metrics(f, et.run_tracker(f, cfg, TrackConfig(),
                                          "greedy"))
    mh = et.mot_metrics(f, et.run_tracker(f, cfg, TrackConfig(),
                                          "hungarian"))
    assert mg["mota"] >= mh["mota"] - 0.03, (mg, mh)
    assert mg["id_switches"] <= mh["id_switches"] + 20, (mg, mh)


def test_forecast_calibration_beats_persistence():
    """Predictive occupancy has positive skill vs the zero-velocity
    persistence baseline at every served horizon, AND is calibrated:
    after round 5's survival-hazard discount (exp(-0.32 h), fit on this
    seed, validated held-out on seeds 1-3 — docs/QUALITY.md forecast
    table) every well-populated bin >= 0.5 sits within 0.1 of its
    empirical frequency at 1 s (round 4 shipped 0.96 predicted vs 0.69
    empirical in the top bin — overconfident by 0.27)."""
    from grid_vision_tpu.train import eval_tracking as et

    cfg = GridVisionConfig(use_vision_orientation=False)
    objs = et.make_crossing_scenario(0, 200)
    f = et.simulate(objs, cfg, 200, seed=0)
    tc = TrackConfig()
    snaps = et.run_tracker(f, cfg, tc)
    cal = et.forecast_calibration(f, snaps, cfg, tc,
                                  horizons=(0.5, 1.0, 2.0), stride=10)
    for h, r in cal.items():
        assert r["skill_vs_persistence"] > 0.0, (h, r)
    # and the 1 s forecast is not trivially diffuse: it still localizes
    assert cal[1.0]["precision"] > 0.35, cal[1.0]
    # reliability floor (the round-4 weakness): high-probability bins
    # must mean what they say. Small-n bins are sampling noise — gate
    # on n_cells (measured seed-0 gaps at 1 s: <= 0.04 on all bins with
    # n >= 2000; margin to 0.1).
    for h in (0.5, 1.0):
        for row in cal[h]["reliability"]:
            lo = float(row["bin"].split("-")[0])
            if lo >= 0.5 and row["n_cells"] >= 2000:
                gap = abs(row["mean_pred"] - row["empirical"])
                assert gap <= 0.1, (h, row)
