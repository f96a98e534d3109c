"""Grid delta codec (io/grid_codec.py): exact keyframe+delta round
trips, gap recovery, compression on engine-like streams, the .gvg
recording container, and the /grid.gvd HTTP consumer stream."""

import threading
import time

import numpy as np
import pytest

from grid_vision_tpu.io.grid_codec import (DELTA, KEYFRAME,
                                           GridDeltaDecoder,
                                           GridDeltaEncoder,
                                           GridRecordReader,
                                           GridRecordWriter,
                                           read_record_header)


def _engine_like_stream(n=40, shape=(120, 80), seed=0):
    """An occupancy-like int8 stream: mostly-static background at the
    decay floor, a few moving footprints — the shape real engine output
    has (most cells parked at clamp, sparse change)."""
    rng = np.random.default_rng(seed)
    grids = []
    g = np.full(shape, 12, np.int8)     # sigmoid(-2.0) * 100
    pos = np.array([20.0, 30.0])
    vel = np.array([1.3, 0.7])
    for _ in range(n):
        g = g.copy()
        # old footprint decays a little
        g[g > 12] = np.maximum(g[g > 12] - 9, 12)
        pos = (pos + vel) % np.array(shape)
        x, y = int(pos[0]), int(pos[1])
        g[x:x + 6, y:y + 4] = 90 + rng.integers(0, 8)
        grids.append(g)
    return grids


def test_round_trip_exact_over_stream():
    enc = GridDeltaEncoder(keyframe_interval=8)
    dec = GridDeltaDecoder()
    for i, g in enumerate(_engine_like_stream()):
        rec = enc.encode(g, step=i, stamp_ns=1000 + i)
        out = dec.decode(rec)
        assert out is not None
        got, step, stamp = out
        np.testing.assert_array_equal(got, g)
        assert got.dtype == np.int8
        assert step == i and stamp == 1000 + i


def test_first_record_is_keyframe_and_interval_respected():
    enc = GridDeltaEncoder(keyframe_interval=4)
    kinds = []
    for i, g in enumerate(_engine_like_stream(10)):
        kinds.append(read_record_header(enc.encode(g))[0])
    assert kinds[0] == KEYFRAME
    # a keyframe at least every 5 records (interval 4 deltas between)
    for w in range(0, len(kinds) - 4):
        assert KEYFRAME in kinds[w:w + 5]
    assert DELTA in kinds   # deltas actually happen on this stream


def test_random_grids_round_trip():
    rng = np.random.default_rng(3)
    enc = GridDeltaEncoder(keyframe_interval=16)
    dec = GridDeltaDecoder()
    g = rng.integers(-1, 101, (37, 53)).astype(np.int8)
    for i in range(30):
        # random sparse mutation, occasionally dense
        g = g.copy()
        k = 900 if i % 7 == 0 else 17
        idx = rng.integers(0, g.size, k)
        g.reshape(-1)[idx] = rng.integers(-1, 101, k).astype(np.int8)
        out = dec.decode(enc.encode(g, step=i))
        np.testing.assert_array_equal(out[0], g)


def test_gap_recovery_via_keyframe():
    enc = GridDeltaEncoder(keyframe_interval=6)
    dec = GridDeltaDecoder()
    grids = _engine_like_stream(20)
    recs = [enc.encode(g, step=i) for i, g in enumerate(grids)]
    assert dec.decode(recs[0]) is not None
    # drop records 1-2 (latest-wins transport); 3 is a delta onto 2
    kind3 = read_record_header(recs[3])[0]
    out = dec.decode(recs[3])
    if kind3 == DELTA:
        assert out is None          # gap detected, not silently wrong
    # decoder re-syncs at the next keyframe and is exact afterwards
    resynced = False
    for i in range(4, 20):
        out = dec.decode(recs[i])
        if out is not None:
            np.testing.assert_array_equal(out[0], grids[i])
            resynced = True
    assert resynced


def test_shape_change_forces_keyframe():
    enc = GridDeltaEncoder(keyframe_interval=100)
    dec = GridDeltaDecoder()
    a = np.zeros((16, 16), np.int8)
    b = np.zeros((8, 32), np.int8)
    dec.decode(enc.encode(a))
    rec = enc.encode(b)
    assert read_record_header(rec)[0] == KEYFRAME
    out = dec.decode(rec)
    assert out[0].shape == (8, 32)


def test_compression_on_engine_like_stream():
    grids = _engine_like_stream(40)
    raw = sum(g.nbytes for g in grids)
    enc = GridDeltaEncoder(keyframe_interval=32)
    total = sum(len(enc.encode(g)) for g in grids)
    # headline claim: order(s)-of-magnitude below the raw export
    assert total < raw / 20, (total, raw)


def test_delta_never_larger_than_keyframe():
    """encode() falls back to a keyframe when the delta would lose."""
    rng = np.random.default_rng(1)
    enc = GridDeltaEncoder(keyframe_interval=1000)
    enc.encode(rng.integers(-1, 101, (64, 64)).astype(np.int8))
    # random -> constant: the delta is a full-grid raw span, but the
    # constant grid keyframes to a handful of bytes — keyframe must win
    g2 = np.zeros((64, 64), np.int8)
    rec = enc.encode(g2)
    assert len(rec) < 64         # actually tiny, not just smaller
    assert read_record_header(rec)[0] == KEYFRAME
    out = GridDeltaDecoder().decode(rec)   # keyframes are self-contained
    np.testing.assert_array_equal(out[0], g2)


def test_gvg_file_round_trip(tmp_path):
    path = str(tmp_path / "out.gvg")
    grids = _engine_like_stream(25)
    with GridRecordWriter(path, keyframe_interval=8) as w:
        for i, g in enumerate(grids):
            w.write(g, step=i, stamp_ns=i * 7)
        assert w.n_records == 25
    got = list(GridRecordReader(path))
    assert len(got) == 25
    for i, (g, step, stamp) in enumerate(got):
        np.testing.assert_array_equal(g, grids[i])
        assert step == i and stamp == i * 7


def test_gvg_rejects_garbage(tmp_path):
    p = tmp_path / "junk.gvg"
    p.write_bytes(b"NOPE" + b"\x00" * 16)
    with pytest.raises(ValueError):
        GridRecordReader(str(p))


def test_http_gvd_stream_round_trip():
    """End-to-end: publisher session -> /grid.gvd -> gvd_client decodes
    the exact grids (the remote machine-consumer path)."""
    import os

    from grid_vision_tpu.config import GridVisionConfig
    from grid_vision_tpu.runtime import viewer
    from grid_vision_tpu.runtime.session import SessionPublisher
    from tests.test_viewer_http import _fake_output

    cfg = GridVisionConfig(grid_x=24, grid_y=12, resolution=0.25,
                           camera_image_height=32, camera_image_width=32,
                           fx=16.0, fy=16.0, cx=16.0, cy=16.0,
                           max_points=64)
    session = "gvtest-gvd"
    pub = SessionPublisher(session, cfg, overlay=False)
    out0 = _fake_output(cfg)
    pub.publish(0, out0)
    port = 20000 + os.getpid() % 10000
    th = threading.Thread(target=viewer.http_view, args=(session, port),
                          kwargs={"max_seconds": 20.0}, daemon=True)
    th.start()
    time.sleep(1.0)

    stop = threading.Event()

    def produce():
        i = 1
        while not stop.is_set():
            pub.publish(i, out0, stamp_ns=i)
            i += 1
            time.sleep(0.03)

    prod = threading.Thread(target=produce, daemon=True)
    prod.start()
    try:
        got = list(viewer.gvd_client("127.0.0.1", port, max_records=4,
                                     timeout=15.0))
        assert len(got) == 4
        expect = np.asarray(out0.occupancy_i8, np.int8)
        steps = []
        for g, step, _stamp in got:
            np.testing.assert_array_equal(g, expect)
            steps.append(step)
        assert steps == sorted(steps)   # monotone stream
    finally:
        stop.set()
        prod.join(timeout=5)
        pub.unlink()
        pub.close()
