"""Recording/playback (runtime/record.py): byte-exact round trip — a
played recording carries the identical grid state as live replay of the
same scene, and the config travels with the file."""

import numpy as np
import pytest

from grid_vision_tpu import pipeline
from grid_vision_tpu.config import GridVisionConfig
from grid_vision_tpu.demo import default_extrinsics
from grid_vision_tpu.io.scene import SyntheticScene
from grid_vision_tpu.runtime.record import (RecordReader, RecordWriter,
                                            play, record_scene)
from grid_vision_tpu.runtime.stream import replay


def small_cfg():
    return GridVisionConfig(max_points=512, camera_image_height=96,
                            camera_image_width=128, fx=64.0, fy=64.0,
                            cx=64.0, cy=48.0, grid_x=24, grid_y=12,
                            resolution=0.25)


def test_record_play_matches_live_replay(tmp_path):
    cfg = small_cfg()
    path = str(tmp_path / "drive.gvr")
    n = record_scene(path, cfg, n_steps=6, hz=10.0, seed=4)
    assert n == 6

    with RecordReader(path) as r:
        assert r.n_frames == 6
        assert r.cfg.max_points == cfg.max_points
        assert r.cfg.grid_size == cfg.grid_size

    n_played, state = play(path, chunk=3)
    assert n_played == 6

    eng = pipeline.Engine(cfg, extrinsics=default_extrinsics(), seed=0)
    scene = SyntheticScene(cfg, seed=4)
    scene.add_default_traffic()
    res = replay(eng, scene, n_steps=6, hz=10.0)
    np.testing.assert_array_equal(np.asarray(state.log_odds),
                                  np.asarray(res.final_state.log_odds))


def test_reader_rejects_garbage(tmp_path):
    p = tmp_path / "junk.gvr"
    p.write_bytes(b"NOPE" + b"\x00" * 64)
    with pytest.raises(ValueError):
        RecordReader(str(p))


def test_writer_rejects_wrong_size(tmp_path):
    cfg = small_cfg()
    with RecordWriter(str(tmp_path / "x.gvr"), cfg) as w:
        with pytest.raises(ValueError):
            w.write(np.zeros(13, np.uint8))


def test_play_grid_out_records_output_stream(tmp_path):
    """play(grid_out=...) persists the exact per-step occupancy stream
    (the .gvg output bag; io/grid_codec.py)."""
    from grid_vision_tpu.io.grid_codec import GridRecordReader

    cfg = small_cfg()
    path = str(tmp_path / "drive.gvr")
    record_scene(path, cfg, n_steps=4, hz=10.0, seed=4)

    want = []
    play(path, on_step=lambda i, s, out: want.append(
        np.asarray(out.occupancy_i8, np.int8)))

    gvg = str(tmp_path / "drive.gvg")
    n, _ = play(path, grid_out=gvg)
    assert n == 4
    got = list(GridRecordReader(gvg))
    assert len(got) == 4
    for i, (g, step, _stamp) in enumerate(got):
        assert step == i
        np.testing.assert_array_equal(g, want[i])
