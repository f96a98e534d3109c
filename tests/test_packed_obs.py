"""Packed-wire observation path: pack/unpack roundtrip and bit-equality
of the single-transfer streaming step vs the typed-Obs step."""

import jax
import jax.numpy as jnp
import numpy as np

from grid_vision_tpu import pipeline
from grid_vision_tpu.config import GridVisionConfig
from grid_vision_tpu.demo import default_extrinsics
from grid_vision_tpu.io.scene import SyntheticScene
from grid_vision_tpu.runtime.stream import (obs_from_scene,
                                            packed_from_scene, replay)
from grid_vision_tpu.types import Obs, PointCloud


def small_cfg():
    return GridVisionConfig(max_points=512, camera_image_height=96,
                            camera_image_width=128, fx=64.0, fy=64.0,
                            cx=64.0, cy=48.0, grid_x=24, grid_y=12,
                            resolution=0.25)


def test_pack_unpack_roundtrip():
    cfg = small_cfg()
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (96, 128, 3), np.uint8)
    xyz, inten, n, dropped = PointCloud.pack_host(
        rng.uniform(-5, 5, (300, 3)).astype(np.float32), None,
        cfg.max_points)
    buf = Obs.pack_bytes(img, xyz, inten, n, True, True, cfg)
    assert buf.shape == (Obs.packed_nbytes(cfg),)
    obs = jax.jit(lambda b: Obs.unpack(b, cfg))(jnp.asarray(buf))
    np.testing.assert_array_equal(np.asarray(obs.image), img)
    np.testing.assert_array_equal(np.asarray(obs.cloud.xyz), xyz)
    np.testing.assert_array_equal(np.asarray(obs.cloud.intensity), inten)
    assert int(obs.cloud.count) == n == 300
    assert bool(obs.has_image) and bool(obs.has_cloud)


def test_pack_unpack_flags():
    cfg = small_cfg()
    img = np.zeros((96, 128, 3), np.uint8)
    xyz = np.full((cfg.max_points, 3), PointCloud.PAD_SENTINEL, np.float32)
    inten = np.zeros((cfg.max_points,), np.float32)
    buf = Obs.pack_bytes(img, xyz, inten, 0, False, False, cfg)
    obs = Obs.unpack(jnp.asarray(buf), cfg)
    assert not bool(obs.has_image) and not bool(obs.has_cloud)
    assert int(obs.cloud.count) == 0


def test_packed_step_matches_typed_step():
    """Same scene frame through Engine() (typed f32 Obs) and
    Engine.call_packed (uint8 wire buffer) -> bit-identical grids.
    The scene renderer emits integer-valued pixels, so the rgb8 wire
    format is lossless here."""
    cfg = small_cfg()
    eng_a = pipeline.Engine(cfg, extrinsics=default_extrinsics(), seed=0)
    eng_b = pipeline.Engine(cfg, extrinsics=default_extrinsics(), seed=0)
    scene = SyntheticScene(cfg, seed=0)
    scene.add_default_traffic()

    state_a = eng_a.init_state()
    state_b = eng_b.init_state()
    for i in range(3):
        t = i * 0.1
        obs = obs_from_scene(scene, t, cfg)
        buf, _dropped = packed_from_scene(scene, t, cfg)
        state_a, out_a = eng_a(state_a, obs)
        state_b, out_b = eng_b.call_packed(state_b, jnp.asarray(buf))
        np.testing.assert_array_equal(np.asarray(state_a.log_odds),
                                      np.asarray(state_b.log_odds))
        np.testing.assert_array_equal(np.asarray(out_a.occupancy_i8),
                                      np.asarray(out_b.occupancy_i8))


def test_yuv420_codec_flat_regions_near_exact():
    from grid_vision_tpu.types import rgb_to_yuv420, yuv420_to_rgb
    img = np.zeros((32, 48, 3), np.uint8)
    img[:16] = [96, 96, 96]
    img[16:] = [220, 60, 50]
    y, u, v = rgb_to_yuv420(img)
    back = np.asarray(yuv420_to_rgb(jnp.asarray(y), jnp.asarray(u),
                                    jnp.asarray(v)))
    # flat 2x2 blocks -> only rounding error survives
    assert np.abs(back - img.astype(np.float32)).max() <= 2.0


def test_yuv420_codec_luma_preserved():
    from grid_vision_tpu.types import rgb_to_yuv420, yuv420_to_rgb
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (64, 64, 3), np.uint8)
    y, u, v = rgb_to_yuv420(img)
    back = np.asarray(yuv420_to_rgb(jnp.asarray(y), jnp.asarray(u),
                                    jnp.asarray(v)))
    y2 = (0.299 * back[..., 0] + 0.587 * back[..., 1]
          + 0.114 * back[..., 2])
    y1 = (0.299 * img[..., 0] + 0.587 * img[..., 1]
          + 0.114 * img[..., 2])
    assert np.abs(y1 - y2).mean() < 2.5  # chroma clipping only


def _wire_cfg():
    import dataclasses
    return dataclasses.replace(small_cfg(), wire_image_codec="yuv420",
                               wire_cloud_dtype="float16")


def test_pack_unpack_wire_mode():
    cfg = _wire_cfg()
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (96, 128, 3), np.uint8)
    xyz, inten, n, _ = PointCloud.pack_host(
        rng.uniform(-40, 60, (300, 3)).astype(np.float32),
        rng.uniform(0, 200, 300).astype(np.float32), cfg.max_points)
    buf = Obs.pack_bytes(img, xyz, inten, n, True, True, cfg)
    assert buf.shape == (Obs.packed_nbytes(cfg),)
    assert buf.nbytes < Obs.packed_nbytes(small_cfg()) * 0.6
    obs = jax.jit(lambda b: Obs.unpack(b, cfg))(jnp.asarray(buf))
    assert int(obs.cloud.count) == n
    got = np.asarray(obs.cloud.xyz)
    # valid rows: f16 relative error; padded rows: exact sentinel restored
    np.testing.assert_allclose(got[:n], xyz[:n], rtol=1e-3, atol=0.05)
    assert (got[n:] == PointCloud.PAD_SENTINEL).all()
    np.testing.assert_allclose(np.asarray(obs.cloud.intensity)[:n],
                               np.clip(inten[:n], 0, 255).astype(np.uint8),
                               atol=0.5)


def test_wire_mode_grid_close_to_lossless():
    """yuv420 + f16 wire vs lossless wire: occupancy grids agree within
    one int8 step on >=99% of cells over a replayed scene."""
    cfg_l = small_cfg()
    cfg_w = _wire_cfg()
    eng_l = pipeline.Engine(cfg_l, extrinsics=default_extrinsics(), seed=0)
    eng_w = pipeline.Engine(cfg_w, extrinsics=default_extrinsics(), seed=0)
    scene = SyntheticScene(cfg_l, seed=0)
    scene.add_default_traffic()
    s_l, s_w = eng_l.init_state(), eng_w.init_state()
    for i in range(3):
        t = i * 0.1
        buf_l, _ = packed_from_scene(scene, t, cfg_l)
        buf_w, _ = packed_from_scene(scene, t, cfg_w)
        s_l, out_l = eng_l.call_packed(s_l, jnp.asarray(buf_l))
        s_w, out_w = eng_w.call_packed(s_w, jnp.asarray(buf_w))
    a = np.asarray(out_l.occupancy_i8, np.int32)
    b = np.asarray(out_w.occupancy_i8, np.int32)
    agree = (np.abs(a - b) <= 1).mean()
    assert agree >= 0.99, agree


def test_replay_packed_runs():
    cfg = small_cfg()
    eng = pipeline.Engine(cfg, extrinsics=default_extrinsics(), seed=0)
    scene = SyntheticScene(cfg, seed=1)
    scene.add_default_traffic()
    seen = []
    res = replay(eng, scene, n_steps=5,
                 on_step=lambda i, s, o: seen.append(i))
    assert res.n_steps == 5 and seen == list(range(5))
    assert np.isfinite(np.asarray(res.final_state.log_odds)).all()


def test_replay_ring_runs():
    """Ring ingest streams pre-packed frames through the chunked path
    and carries a finite grid (the bench config-4c path)."""
    from grid_vision_tpu.runtime.stream import replay_ring
    cfg = small_cfg()
    eng = pipeline.Engine(cfg, extrinsics=default_extrinsics(), seed=0)
    scene = SyntheticScene(cfg, seed=3)
    scene.add_default_traffic()
    res = replay_ring(eng, scene, n_steps=8, chunk=4, ring=6)
    assert res.n_steps == 8
    assert np.isfinite(np.asarray(res.final_state.log_odds)).all()


def test_replay_chunked_matches_per_frame():
    """Throughput mode (K frames / dispatch) carries the identical grid
    state as K per-frame packed steps."""
    from grid_vision_tpu.runtime.stream import replay_chunked
    cfg = small_cfg()
    eng_a = pipeline.Engine(cfg, extrinsics=default_extrinsics(), seed=0)
    eng_b = pipeline.Engine(cfg, extrinsics=default_extrinsics(), seed=0)
    scene_a = SyntheticScene(cfg, seed=2)
    scene_a.add_default_traffic()
    scene_b = SyntheticScene(cfg, seed=2)
    scene_b.add_default_traffic()
    res_a = replay(eng_a, scene_a, n_steps=6)
    res_b = replay_chunked(eng_b, scene_b, n_steps=6, chunk=3)
    assert res_b.n_steps == 6
    np.testing.assert_array_equal(
        np.asarray(res_a.final_state.log_odds),
        np.asarray(res_b.final_state.log_odds))


def test_delta_wire_roundtrip_exact():
    """ROI-delta unpack reproduces the full frame byte-for-byte when the
    change fits the window (types.pack_delta_bytes / unpack_delta)."""
    from grid_vision_tpu.types import (delta_roi_shape, pack_delta_bytes,
                                       unpack_delta)
    cfg = small_cfg()
    rng = np.random.default_rng(0)
    h, w = cfg.camera_image_height, cfg.camera_image_width
    prev = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    new = prev.copy()
    hr, wr = delta_roi_shape(cfg)
    y0, x0 = 11, 17
    new[y0 + 3:y0 + 20, x0 + 5:x0 + 30] = rng.integers(
        0, 256, (17, 25, 3)).astype(np.uint8)
    xyz = np.full((cfg.max_points, 3), PointCloud.PAD_SENTINEL,
                  np.float32)
    xyz[:40] = rng.normal(size=(40, 3))
    inten = np.zeros((cfg.max_points,), np.float32)
    buf = pack_delta_bytes(new[y0:y0 + hr, x0:x0 + wr], y0, x0, xyz,
                           inten, 40, True, True, cfg)
    obs = jax.jit(lambda b, p: unpack_delta(b, p, cfg))(
        jnp.asarray(buf), jnp.asarray(prev))
    np.testing.assert_array_equal(np.asarray(obs.image), new)
    assert int(obs.cloud.count) == 40
    np.testing.assert_allclose(np.asarray(obs.cloud.xyz[:40]), xyz[:40],
                               rtol=1e-6)


def test_replay_delta_matches_per_frame():
    """The ROI-delta live path (Engine.call_packed_delta) carries the
    IDENTICAL grid state as the full per-frame packed path on the same
    scene — keyframes and deltas compose exactly."""
    from grid_vision_tpu.runtime.stream import replay_delta
    cfg = small_cfg()
    eng_a = pipeline.Engine(cfg, extrinsics=default_extrinsics(), seed=0)
    eng_b = pipeline.Engine(cfg, extrinsics=default_extrinsics(), seed=0)
    scene_a = SyntheticScene(cfg, seed=2)
    scene_a.add_default_traffic()
    scene_b = SyntheticScene(cfg, seed=2)
    scene_b.add_default_traffic()
    res_a = replay(eng_a, scene_a, n_steps=8)
    res_b = replay_delta(eng_b, scene_b, n_steps=8)
    enc = res_b.delta_encoder
    assert enc.keyframes >= 1                   # frame 0 at least
    assert enc.deltas >= 1, (enc.keyframes, enc.deltas)
    np.testing.assert_array_equal(
        np.asarray(res_a.final_state.log_odds),
        np.asarray(res_b.final_state.log_odds))

def test_delta_encoder_drift_bounded():
    """Sub-threshold global drift (1 level/frame, never exceeding the
    per-frame threshold vs the TRUE previous frame) must not accumulate
    unboundedly: the encoder diffs against the DECODER-VISIBLE
    reconstruction, so accumulated residual > threshold forces a
    keyframe and the decoder's frame stays within `threshold` grey
    levels of truth at every step."""
    from grid_vision_tpu.runtime.stream import PackedDeltaEncoder
    from grid_vision_tpu.types import unpack_delta
    cfg = small_cfg()
    enc = PackedDeltaEncoder(cfg, threshold=2)
    h, w = cfg.camera_image_height, cfg.camera_image_width
    xyz = np.full((cfg.max_points, 3), PointCloud.PAD_SENTINEL,
                  np.float32)
    inten = np.zeros((cfg.max_points,), np.float32)
    recon = np.zeros((h, w, 3), np.uint8)
    unpack = jax.jit(lambda b, p: unpack_delta(b, p, cfg))
    for i in range(12):
        img = np.full((h, w, 3), 10 * (i + 1) // 10 + i, np.uint8)
        key, buf = enc.encode(img, xyz, inten, 0, True, False)
        if key:
            obs = jax.jit(lambda b: Obs.unpack(b, cfg))(jnp.asarray(buf))
        else:
            obs = unpack(jnp.asarray(buf), jnp.asarray(recon))
        recon = np.asarray(obs.image)
        err = np.abs(recon.astype(np.int16) - img.astype(np.int16)).max()
        assert err <= enc.threshold, (i, err)
    assert enc.keyframes >= 2  # drift periodically forced a resync


def test_delta_encoder_periodic_keyframe():
    """A static scene still re-keys every keyframe_interval records."""
    from grid_vision_tpu.runtime.stream import PackedDeltaEncoder
    cfg = small_cfg()
    enc = PackedDeltaEncoder(cfg, keyframe_interval=4)
    img = np.full((cfg.camera_image_height, cfg.camera_image_width, 3),
                  7, np.uint8)
    xyz = np.full((cfg.max_points, 3), PointCloud.PAD_SENTINEL,
                  np.float32)
    inten = np.zeros((cfg.max_points,), np.float32)
    keys = [enc.encode(img, xyz, inten, 0, True, False)[0]
            for _ in range(10)]
    assert keys == [True, False, False, False, False,
                    True, False, False, False, False]


def test_plan_wire_gate_and_crossover():
    """The adaptive wire gate (round 5, VERDICT r4 #7): delta is chosen
    exactly when the measured link bandwidth is below the closed-form
    crossover (bytes saved per frame / encoder seconds per frame), and
    the plan's byte/timing fields are self-consistent."""
    from grid_vision_tpu.runtime.stream import plan_wire
    cfg = small_cfg()
    scene = SyntheticScene(cfg, seed=2)
    scene.add_default_traffic()

    # a crawling link (1 MB/s): transfer dominates -> delta
    slow = plan_wire(cfg, scene, 1e6, sample=8)
    assert slow.bytes_delta_expected < slow.bytes_full
    assert slow.keyframe_frac < 1.0
    assert slow.mode == "delta", slow
    # an effectively infinite link: encoder cost is pure loss -> full
    fast = plan_wire(cfg, scene, 1e12, sample=8)
    assert fast.mode == "full", fast
    # the boundary is the crossover field (encode_s is a wall-time
    # measurement, so the crossover jitters run to run — test with 4x
    # margins, not at the knife edge)
    below = plan_wire(cfg, scene, slow.crossover_bw_bytes_s / 4,
                      sample=8)
    above = plan_wire(cfg, scene, slow.crossover_bw_bytes_s * 4,
                      sample=8)
    assert below.mode == "delta" and above.mode == "full"
    # estimates: on the slow link delta must predict higher Hz
    assert slow.est_hz_delta > slow.est_hz_full


def test_plan_wire_non_rgb8_is_full():
    """No delta encoder exists for the yuv420 wire: the plan must fall
    back to 'full' with a zero crossover instead of raising."""
    import dataclasses as dc
    from grid_vision_tpu.runtime.stream import plan_wire
    cfg = dc.replace(small_cfg(), wire_image_codec="yuv420")
    scene = SyntheticScene(cfg, seed=2)
    scene.add_default_traffic()
    plan = plan_wire(cfg, scene, 1.0, sample=4)   # even a 1 B/s link
    assert plan.mode == "full"
    assert plan.crossover_bw_bytes_s == 0.0


def test_replay_auto_dispatches_by_plan():
    """replay_auto picks the delta path on a slow link and the full
    path on a fast one, and both produce the same final grid as the
    plain per-frame replay (the wires are exact)."""
    from grid_vision_tpu.runtime.stream import replay_auto
    cfg = small_cfg()

    def run(bw):
        eng = pipeline.Engine(cfg, extrinsics=default_extrinsics(),
                              seed=0)
        scene = SyntheticScene(cfg, seed=2)
        scene.add_default_traffic()
        return replay_auto(eng, scene, n_steps=6, link_bw_bytes_s=bw)

    plan_slow, res_slow = run(1e5)
    plan_fast, res_fast = run(1e12)
    assert plan_slow.mode == "delta" and plan_fast.mode == "full"
    np.testing.assert_array_equal(
        np.asarray(res_slow.final_state.log_odds),
        np.asarray(res_fast.final_state.log_odds))
