"""Full benchmark suite: one entry per BASELINE.json config.

`python bench_suite.py [--rigs N] [--out BENCH_DETAIL.json]`

Configs measured (BASELINE.json "configs"):
  1. cloud -> grid only (raycast carve, no detections)
  2. detection + NMS + association, single frame path
  3. full fusion (detect + associate + orientation + grid)
  4. streaming 10 Hz sequence with temporal decay (achieved Hz, 1 rig)
  5. batched rigs, full fusion (the headline fused frames/s)
  5b. compat-grade line: float32 + exact full-capacity kNN +
      compat=True at FLEET throughput (budget-degenerate fleet_step +
      the rounding-equal Pallas stem — every piece proven result-
      identical to vmap(step); the config the parity evidence
      attaches to)
  6. shared world grid (8 rigs -> 1 grid), K=8 scan-chained ticks per
     dispatch (SharedGrid.call_chunk)
  7. tracked fleet: config 5's production path + the per-rig multi-
     object tracker (ops/tracking.py) in the same scan — measures the
     tracker's marginal cost on the headline path
  7f. config 7 + predictive-occupancy forecast at publish cadence
      (serve --track --forecast marginal cost)

The headline single-line bench for the driver stays in bench.py; this
suite writes a JSON dict of all metrics for profiling across rounds.
Uses the same readback-sync methodology as bench.py (this machine's
tunnel backend has an async block_until_ready).
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from grid_vision_tpu import pipeline
from grid_vision_tpu.config import GridVisionConfig
from grid_vision_tpu.ops import raycast, rasterize
from grid_vision_tpu.ops.decode import extract_boxes
from grid_vision_tpu.models import yolov4_tiny
from grid_vision_tpu.types import GridState, LShapePoses, Obs, PointCloud
from bench import output_digest, readback, synth_obs


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def time_chunks(fn, *args, n_warm=1, budget_s=45.0, unit_count=1,
                groups=4, spread=None):
    """Run fn repeatedly; return units/sec with readback sync.

    Timed in `groups` windows with a readback each, reporting the
    MEDIAN window's rate — the tunnel to this chip intermittently
    degrades 3-20x for tens of seconds (same build measured config1 at
    3 017 and 941 scans/s back to back), and a single window silently
    records the stall instead of the engine (same methodology as
    bench.py's median-of-groups).

    spread: optional list — receives every kept window's rate, so
    single-dispatch rows (latency configs 2/3) can record their
    min/median/max alongside the median (VERDICT r3 weak #2)."""
    import numpy as np

    out = None
    for _ in range(n_warm):
        out = fn(*args)
    _ = readback(jax.tree_util.tree_leaves(out)[0])
    t = time.perf_counter()
    _ = readback(jax.tree_util.tree_leaves(out)[0])
    sync = time.perf_counter() - t

    rates = []
    t_all = time.perf_counter()
    for g in range(2 * groups):
        count = 0
        t0 = time.perf_counter()
        while count < 2 or time.perf_counter() - t0 < budget_s / 16:
            out = fn(*args)
            count += 1
            if count >= 16:
                break
        _ = readback(jax.tree_util.tree_leaves(out)[0])
        dt = time.perf_counter() - t0 - sync
        # Discard (don't clamp) windows whose dt <= 0: the one-time sync
        # estimate can exceed a later window's true readback when tunnel
        # latency varies (50 ms .. minutes per CLAUDE.md), and a clamped
        # 1e-9 window would inject an absurd ~1e12 rate into the median.
        if dt > 0:
            rates.append(unit_count * count / dt)
        # never break before 3 kept windows: a stall in window 0 would
        # otherwise BE the median (the failure this method rejects)
        if len(rates) >= max(3, groups) or (
                len(rates) >= 3 and time.perf_counter() - t_all > budget_s):
            break
    if not rates:
        # every window was swallowed by the sync estimate; fall back to
        # the raw (sync-inclusive) rate of the last window
        rates = [unit_count * count / max(time.perf_counter() - t0, 1e-9)]
    if spread is not None:
        spread.extend(rates)
    return float(np.median(rates))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rigs", type=int, default=64)
    ap.add_argument("--out", default="BENCH_DETAIL.json")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--only", default=None,
                    help="comma list of configs to run "
                         "(1,2,3,4,5,5b,6,7,7f); results merge into "
                         "--out instead of replacing")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    only = set(args.only.split(",")) if args.only else None

    def want(tag):
        return only is None or tag in only

    results = {}
    if only is not None:
        try:
            with open(args.out) as f:
                results = json.load(f)
        except (OSError, ValueError):
            pass
    # detector_stem_backend="pallas": the fused resize+stem kernel
    # measured +8.6% on the 64-rig exact fleet step in an interleaved
    # A/B (tools/bench_stem_ab.py: 6859 vs 6318 fused fps); every suite
    # path calls the detector un-vmapped, so the kernel's no-vmap rule
    # holds. GV_BENCH_STEM=xla restores the plain conv path.
    # max_static_depth=16: the static-compacted kNN perf opt-in (the
    # config default is now max_detections for reference parity).
    # orientation_stem_backend stays "xla": the fused pallas front end
    # is a measured NEGATIVE once its Mosaic miscompile was fixed
    # (5999 vs 6354 fused fps; docs/PERF.md round-5 postmortem).
    cfg = GridVisionConfig(
        max_points=8192, compute_dtype="bfloat16", max_static_depth=16,
        detector_stem_backend=os.environ.get("GV_BENCH_STEM", "pallas"),
        orientation_stem_backend=os.environ.get("GV_BENCH_ORIENT_STEM",
                                                "xla"))
    eng = pipeline.Engine(cfg, seed=0)
    obs1 = jax.jit(functools.partial(synth_obs, cfg=cfg))(
        jax.random.PRNGKey(7))
    k = jax.random.PRNGKey(0)
    scan5 = 8  # fleet-chunk scan depth (configs 5/5b). Dispatches are
    # pipelined on this link: 16 measured the same rate as 8, so the
    # lower-latency depth stays.

    # ---- config 1: cloud -> grid with raycast carve --------------------
    if want('1'):
        # fused Pallas carve+update kernel (bit-equal to the XLA chain;
        # ops/pallas_raycast.py — measured 2.5x the XLA path on hardware)
        ccfg = GridVisionConfig(max_points=8192, compat=False,
                                raycast_free_space=True,
                                grid_backend="pallas")
        origin = jnp.asarray([0.0, 0.0])
        scan1 = 32  # K scans per dispatch: one dispatch per scan makes
        # this config measure tunnel dispatch health, not the kernel
        # (same build swung 8545/2839/764 scans/s across runs before
        # chaining; every other config already scan-chains).

        @jax.jit
        def cloud_to_grid(lo, pts, key):
            jit_t = jax.random.uniform(key, (scan1,), jnp.float32,
                                       -0.01, 0.01)

            def body(carry, jitter):
                lo, acc = carry
                lo2, occ = raycast.lshape_update_with_carving(
                    lo, LShapePoses.empty(8), origin, pts[:, :2] + jitter,
                    jnp.ones(pts.shape[0], bool), ccfg)
                # keep the published occupancy export live per tick
                return (lo2, acc + jnp.sum(occ)), ()

            (lo, acc), _ = jax.lax.scan(
                body, (lo, jnp.zeros((), jnp.float32)), jit_t)
            return acc

        lo = GridState.create(ccfg).log_odds
        pts_base = jnp.stack([obs1.cloud.xyz[:, 2], obs1.cloud.xyz[:, 0],
                              obs1.cloud.xyz[:, 1]], -1)

        def run1(lo):
            return cloud_to_grid(lo, pts_base, k)

        results["cloud_to_grid_raycast_fps"] = time_chunks(
            run1, lo, unit_count=scan1)
        log(f"config1 {results['cloud_to_grid_raycast_fps']:.0f} scans/s")

    # ---- config 2: detect + NMS latency --------------------------------
    if want('2'):
        # the SHIPPED single-image path (pipeline.detect dispatches the
        # configured detector_stem_backend, so this measures what the
        # Engine actually runs — it used to hand-roll the XLA front end
        # and silently diverge from the headline configs)
        @jax.jit
        def detect_nms(params, img, key):
            img = img + jax.random.uniform(key, (), jnp.float32, -1, 1)
            return pipeline.detect(params, img, cfg).xyxy

        win2 = []
        fps2 = time_chunks(lambda: detect_nms(eng.params, obs1.image, k),
                           groups=8, spread=win2)
        results["detect_nms_single_fps"] = fps2
        results["detect_nms_single_latency_ms"] = 1e3 / max(fps2, 1e-9)
        # window spread (VERDICT r3 weak #2: latency rows get the same
        # median-of-windows treatment + recorded spread as throughput)
        results["detect_nms_single_latency_ms_spread"] = [
            round(1e3 / r, 3) for r in sorted(win2, reverse=True)]
        log(f"config2 {fps2:.0f} img/s over {len(win2)} windows")

    # ---- config 3: full fusion single rig -------------------------------
    if want('3'):
        step = jax.jit(functools.partial(pipeline.step, cfg=cfg))
        state1 = GridState.create(cfg)

        def run3():
            nonlocal state1
            state1, _ = step(eng.params, state1, obs1, eng.extrinsics)
            return state1.log_odds

        win3 = []
        results["full_fusion_single_fps"] = time_chunks(run3, groups=8,
                                                        spread=win3)
        results["full_fusion_single_fps_spread"] = [
            round(r, 1) for r in sorted(win3)]
        log(f"config3 {results['full_fusion_single_fps']:.0f} fps over "
            f"{len(win3)} windows")

    # ---- config 4: streaming achieved Hz (host-paced ingest) ------------
    if want('4'):
        from grid_vision_tpu.demo import default_extrinsics
        from grid_vision_tpu.io.scene import SyntheticScene
        from grid_vision_tpu.runtime.stream import replay
        eng4 = pipeline.Engine(cfg, extrinsics=default_extrinsics(), seed=0)
        scene = SyntheticScene(cfg, seed=0)
        scene.add_default_traffic()
        replay(eng4, scene, n_steps=2)  # compile
        res = replay(eng4, scene, n_steps=100)
        results["streaming_achieved_hz"] = res.achieved_hz
        log(f"config4 {res.achieved_hz:.1f} Hz (host-paced, packed wire)")

        # config 4b: throughput-mode ingest — K packed frames per transfer,
        # one scan dispatch per chunk, yuv420/f16 wire (stream.replay_chunked).
        import dataclasses
        from grid_vision_tpu.runtime.stream import replay_chunked, replay_ring
        cfg4b = dataclasses.replace(cfg, wire_image_codec="yuv420",
                                    wire_cloud_dtype="float16")
        eng4b = pipeline.Engine(cfg4b, extrinsics=default_extrinsics(), seed=0)
        scene_b = SyntheticScene(cfg4b, seed=0)
        scene_b.add_default_traffic()
        replay_chunked(eng4b, scene_b, n_steps=8, chunk=8)  # compile
        res_b = replay_chunked(eng4b, scene_b, n_steps=400, chunk=8)
        results["streaming_chunked_hz"] = res_b.achieved_hz
        log(f"config4b {res_b.achieved_hz:.1f} Hz (chunked k=8, yuv420/f16)")

        # config 4c: ingest rate from a pre-packed ring (engine capability —
        # excludes the synthetic renderer; a sensor delivers frames for free)
        res_c = replay_ring(eng4b, scene_b, n_steps=400, chunk=8)
        results["streaming_ingest_hz"] = res_c.achieved_hz
        log(f"config4c {res_c.achieved_hz:.1f} Hz (pre-packed ring ingest)")

        # config 4d: per-frame ROI-DELTA wire (round 4, VERDICT r3 weak
        # #6): one dispatch per frame (realtime latency, unlike 4b/4c's
        # K-frame chunks), ~4x fewer image bytes per delta record; f16
        # cloud. Exact vs the full per-frame path
        # (tests/test_packed_obs.py::test_replay_delta_matches_per_frame).
        from grid_vision_tpu.runtime.stream import replay_delta
        cfg4d = dataclasses.replace(cfg, wire_cloud_dtype="float16")
        eng4d = pipeline.Engine(cfg4d, extrinsics=default_extrinsics(),
                                seed=0)
        scene_d = SyntheticScene(cfg4d, seed=0)
        scene_d.add_default_traffic()
        replay_delta(eng4d, scene_d, n_steps=8)   # compile both kinds
        res_d = replay_delta(eng4d, scene_d, n_steps=400)
        enc_d = res_d.delta_encoder
        results["streaming_delta_hz"] = res_d.achieved_hz
        results["streaming_delta_keyframe_frac"] = (
            enc_d.keyframes / max(enc_d.keyframes + enc_d.deltas, 1))
        log(f"config4d {res_d.achieved_hz:.1f} Hz (per-frame ROI-delta "
            f"wire; {enc_d.keyframes} key / {enc_d.deltas} delta)")

        # config 4e (round 5, VERDICT r4 #7): PER-FRAME on the narrow
        # yuv420/f16 wire — one dispatch per frame (realtime latency,
        # no k-frame chunking) but 0.53 MB/frame instead of rgb8/f32's
        # 0.99: the per-frame path was transfer-bound on this link, so
        # the narrow wire is the honest shot at >= 90 Hz per-frame.
        res_e = replay(eng4b, scene_b, n_steps=400)
        results["streaming_perframe_yuv420_hz"] = res_e.achieved_hz
        log(f"config4e {res_e.achieved_hz:.1f} Hz (per-frame, "
            f"yuv420/f16 wire)")

        # config 4f: the adaptive wire gate's decision record on THIS
        # link — measured bandwidth, the closed-form delta/full
        # crossover bandwidth, and the chosen mode (stream.plan_wire).
        from grid_vision_tpu.runtime.stream import (plan_wire,
                                                    probe_link_bandwidth)
        bw = probe_link_bandwidth()
        plan = dataclasses.asdict(plan_wire(cfg4d, scene_d, bw))
        results["wire_plan"] = plan
        log(f"config4f link {bw / 1e6:.1f} MB/s, delta crossover "
            f"{plan['crossover_bw_bytes_s'] / 1e6:.1f} MB/s -> "
            f"{plan['mode']}")

    # rig observation pool, shared by configs 5, 5b and 7
    if want('5') or want('5b') or want('7'):
        keys5 = jax.random.split(jax.random.PRNGKey(0), args.rigs)
        obs_b = jax.jit(jax.vmap(functools.partial(synth_obs, cfg=cfg)))(
            keys5)
        # bf16 image pool (camera pixels are 8-bit; halves the HBM
        # traffic of every image consumer — same choice as bench.py)
        obs_b = Obs(image=obs_b.image.astype(jnp.bfloat16),
                    cloud=obs_b.cloud, has_image=obs_b.has_image,
                    has_cloud=obs_b.has_cloud)

    # ---- config 5: batched rigs (headline) ------------------------------
    if want('5'):
        # The PRODUCTION fleet path (pipeline.fleet_step): per-rig Q7 clamp
        # then fleet-compacted orientation under a 5-crops/rig budget (load-
        # proportional like the reference's dynamic-box TRT batch; equal to
        # plain vmap(step) when the budget covers the load — tested in
        # tests/test_fleet_compaction.py, and the bench pool's measured load
        # is ~2-3 dynamic boxes/rig, tools/bench_load_report.py, so drops
        # are 0). kNN stays EXACT (knn_backend="xla" suite default).
        budget5 = 5 * args.rigs
        fstep = functools.partial(pipeline.fleet_step, cfg=cfg,
                                  orientation_budget=budget5)

        # The chunk CARRIES its RNG key (split in-graph, new key returned):
        # creating a PRNGKey per timed call is a separate host dispatch
        # that costs ~ms through this tunnel — at scan=4/64 rigs that was
        # several us/frame of pure harness overhead (round-3 device
        # profile: PjitFunction(_threefry_seed) 4.1 us/frame).
        @functools.partial(jax.jit, donate_argnums=(1,))
        def fleet_chunk(params, states, obs, extr, key):
            # perturbation scalars pre-drawn per chunk: in-body key
            # splits are u32 scalar-core chains that serialized the
            # step (~13 us/frame, round-3 device profile; same fix as
            # bench.draw_perturbations)
            key, k1, k2 = jax.random.split(key, 3)
            ji_t = jax.random.uniform(k1, (scan5,), jnp.float32, -1, 1)
            jc_t = jax.random.uniform(k2, (scan5,), jnp.float32,
                                      -0.01, 0.01)

            def body(carry, jij):
                s, acc = carry
                ji, jc = jij
                o = Obs(image=obs.image + ji.astype(obs.image.dtype),
                        cloud=PointCloud(xyz=obs.cloud.xyz + jc,
                                         intensity=obs.cloud.intensity,
                                         count=obs.cloud.count),
                        has_image=obs.has_image, has_cloud=obs.has_cloud)
                s2, out = fstep(params, s, o, extr)
                # every published output stays live (bench.output_digest)
                return (s2, acc + output_digest(out)), ()

            (states, acc), _ = jax.lax.scan(
                body, (states, jnp.zeros((), jnp.float32)), (ji_t, jc_t))
            return states, acc, key

        states = GridState.create_batch(cfg, args.rigs)
        holder = {"s": states, "k": jax.device_put(jax.random.PRNGKey(3))}

        def run5():
            holder["s"], acc, holder["k"] = fleet_chunk(
                eng.params, holder["s"], obs_b, eng.extrinsics, holder["k"])
            return acc

        results["fused_frames_per_sec"] = time_chunks(
            run5, unit_count=args.rigs * scan5)
        log(f"config5 {results['fused_frames_per_sec']:.0f} fused frames/s")

    # ---- config 5b: compat-grade line (VERDICT r2 #5, reworked r4) ------
    if want('5b'):
        # Reference-EXACT semantics at fleet throughput (VERDICT r3
        # weak #1b). Every component is individually proven result-
        # identical to the compat vmap(step) chain:
        #   - float32 compute, compat=True, exact kNN at FULL capacity
        #     (max_static_depth default == max_detections — the round-3
        #     line still compacted to 16; this one computes the median
        #     depth for every static box like the reference);
        #   - pipeline.fleet_step with orientation_budget = rigs *
        #     max_orientation_batch (Q7 clamp of 8/rig): the budget
        #     top-k keeps EVERY per-rig slot, so the path degenerates
        #     to exact vmap(step) (tests/test_fleet_compaction.py) —
        #     while dispatching the detector UN-vmapped, which is what
        #     lets the fused Pallas stem run;
        #   - the Pallas resize+stem kernel is float-rounding-EQUAL to
        #     the XLA stem (tests/test_pallas_stem.py), so f32 results
        #     are bit-identical.
        ccfg5 = GridVisionConfig(
            max_points=8192, compute_dtype="float32",
            detector_stem_backend=os.environ.get("GV_BENCH_STEM",
                                                 "pallas"))
        eng5 = pipeline.Engine(ccfg5, seed=0)
        budget5b = args.rigs * ccfg5.max_orientation_batch
        fstep_c = functools.partial(pipeline.fleet_step, cfg=ccfg5,
                                    orientation_budget=budget5b)

        @functools.partial(jax.jit, donate_argnums=(1,))
        def fleet_chunk_compat(params, states, obs, extr, key):
            key, sub = jax.random.split(key)
            ji_t = jax.random.uniform(sub, (scan5,), jnp.float32, -1, 1)

            def body(carry, ji):
                s, acc = carry
                o = Obs(image=obs.image + ji, cloud=obs.cloud,
                        has_image=obs.has_image, has_cloud=obs.has_cloud)
                s2, out = fstep_c(params, s, o, extr)
                return (s2, acc + output_digest(out)), ()
            (states, acc), _ = jax.lax.scan(
                body, (states, jnp.zeros((), jnp.float32)), ji_t)
            return states, acc, key

        # f32 image pool: the compat line's inputs must not pass through
        # the fast path's bf16 storage quantization.
        obs_f32 = Obs(image=obs_b.image.astype(jnp.float32),
                      cloud=obs_b.cloud, has_image=obs_b.has_image,
                      has_cloud=obs_b.has_cloud)
        states_c = GridState.create_batch(ccfg5, args.rigs)
        holder_c = {"s": states_c,
                    "k": jax.device_put(jax.random.PRNGKey(3))}

        def run5c():
            holder_c["s"], acc, holder_c["k"] = fleet_chunk_compat(
                eng5.params, holder_c["s"], obs_f32, eng5.extrinsics,
                holder_c["k"])
            return acc

        results["fused_frames_per_sec_compat_f32"] = time_chunks(
            run5c, unit_count=args.rigs * scan5)
        log(f"config5b {results['fused_frames_per_sec_compat_f32']:.0f} "
            "fused frames/s (compat f32, exact kNN)")

    # ---- config 7: tracked fleet (config 5 + per-rig tracker) -----------
    if want('7'):
        from grid_vision_tpu.ops import tracking as trk
        tcfg7 = trk.TrackConfig()
        budget7 = 5 * args.rigs
        fstep7 = functools.partial(pipeline.fleet_step, cfg=cfg,
                                   orientation_budget=budget7)
        vupd = jax.vmap(functools.partial(trk.update_tracks, cfg=cfg,
                                          tcfg=tcfg7),
                        in_axes=(0, 0, None))

        @functools.partial(jax.jit, donate_argnums=(1, 2))
        def tracked_chunk(params, states, tracks, obs, extr, key):
            key, k1, k2 = jax.random.split(key, 3)
            ji_t = jax.random.uniform(k1, (scan5,), jnp.float32, -1, 1)
            jc_t = jax.random.uniform(k2, (scan5,), jnp.float32,
                                      -0.01, 0.01)

            def body(carry, jij):
                s, tr, acc = carry
                ji, jc = jij
                o = Obs(image=obs.image + ji.astype(obs.image.dtype),
                        cloud=PointCloud(xyz=obs.cloud.xyz + jc,
                                         intensity=obs.cloud.intensity,
                                         count=obs.cloud.count),
                        has_image=obs.has_image, has_cloud=obs.has_cloud)
                s2, out = fstep7(params, s, o, extr)
                tr2, _ = vupd(tr, out, 0.05)
                return (s2, tr2, acc + output_digest(out)), ()

            (states, tracks, acc), _ = jax.lax.scan(
                body, (states, tracks, jnp.zeros((), jnp.float32)),
                (ji_t, jc_t))
            return states, tracks, acc, key

        one_tr = trk.TrackState.create(tcfg7)
        tracks7 = jax.tree_util.tree_map(
            lambda x: jnp.stack([x] * args.rigs), one_tr)
        holder7 = {"s": GridState.create_batch(cfg, args.rigs),
                   "t": tracks7,
                   "k": jax.device_put(jax.random.PRNGKey(3))}

        def run7():
            holder7["s"], holder7["t"], acc, holder7["k"] = tracked_chunk(
                eng.params, holder7["s"], holder7["t"], obs_b,
                eng.extrinsics, holder7["k"])
            return acc

        results["tracked_fused_frames_per_sec"] = time_chunks(
            run7, unit_count=args.rigs * scan5)
        log(f"config7 {results['tracked_fused_frames_per_sec']:.0f} "
            "tracked fused frames/s")

    # ---- config 7f: config 7 + predictive occupancy at publish cadence -
    if want('7f'):
        # serve --track --forecast cost: the per-rig forecast planes
        # (ops/tracking.forecast_occupancy, 3 horizons) are computed
        # ONCE per chunk — the publish cadence, exactly where
        # FleetServer calls Fleet.forecast — and folded into the digest
        # so XLA cannot dead-code them. The delta vs config 7 is the
        # marginal serving cost docs/QUALITY.md cites.
        from grid_vision_tpu.ops import tracking as trk7f
        tcfg7f = trk7f.TrackConfig()
        horizons7f = (0.5, 1.0, 2.0)
        budget7f = 5 * args.rigs
        fstep7f = functools.partial(pipeline.fleet_step, cfg=cfg,
                                    orientation_budget=budget7f)
        vupd7f = jax.vmap(functools.partial(trk7f.update_tracks, cfg=cfg,
                                            tcfg=tcfg7f),
                          in_axes=(0, 0, None))
        vfc = jax.vmap(lambda tr: trk7f.forecast_occupancy(
            tr, horizons7f, cfg, tcfg7f))

        @functools.partial(jax.jit, donate_argnums=(1, 2))
        def forecast_chunk(params, states, tracks, obs, extr, key):
            key, k1, k2 = jax.random.split(key, 3)
            ji_t = jax.random.uniform(k1, (scan5,), jnp.float32, -1, 1)
            jc_t = jax.random.uniform(k2, (scan5,), jnp.float32,
                                      -0.01, 0.01)

            def body(carry, jij):
                s, tr, acc = carry
                ji, jc = jij
                o = Obs(image=obs.image + ji.astype(obs.image.dtype),
                        cloud=PointCloud(xyz=obs.cloud.xyz + jc,
                                         intensity=obs.cloud.intensity,
                                         count=obs.cloud.count),
                        has_image=obs.has_image, has_cloud=obs.has_cloud)
                s2, out = fstep7f(params, s, o, extr)
                tr2, _ = vupd7f(tr, out, 0.05)
                return (s2, tr2, acc + output_digest(out)), ()

            (states, tracks, acc), _ = jax.lax.scan(
                body, (states, tracks, jnp.zeros((), jnp.float32)),
                (ji_t, jc_t))
            planes = vfc(tracks)           # (R, K, H, W) at publish time
            return states, tracks, acc + jnp.sum(planes), key

        one_tr = trk7f.TrackState.create(tcfg7f)
        holder7f = {"s": GridState.create_batch(cfg, args.rigs),
                    "t": jax.tree_util.tree_map(
                        lambda x: jnp.stack([x] * args.rigs), one_tr),
                    "k": jax.device_put(jax.random.PRNGKey(3))}

        def run7f():
            holder7f["s"], holder7f["t"], acc, holder7f["k"] = \
                forecast_chunk(eng.params, holder7f["s"], holder7f["t"],
                               obs_b, eng.extrinsics, holder7f["k"])
            return acc

        results["tracked_forecast_fused_frames_per_sec"] = time_chunks(
            run7f, unit_count=args.rigs * scan5)
        log(f"config7f "
            f"{results['tracked_forecast_fused_frames_per_sec']:.0f} "
            "tracked+forecast fused frames/s (3 horizons @ publish "
            "cadence)")

    # ---- config 6: shared world grid, scan-chained (VERDICT r2 #4) ------
    if want('6'):
        # 8 rigs -> ONE world grid; K=8 ticks per dispatch via
        # SharedGrid.call_chunk. Unit = world ticks (each tick fuses all 8
        # rigs); rig-frames/s = 8x this.
        from jax.sharding import Mesh
        from grid_vision_tpu.parallel.shared_grid import SharedGrid
        from grid_vision_tpu.types import Extrinsics, tree_stack
        n_hub = 8
        hub_mesh = Mesh(np.array(jax.devices()[:1]).reshape(1), ("rig",))
        sg = SharedGrid(cfg, n_rigs=n_hub, mesh=hub_mesh,
                        params=eng.params,
                        orientation_budget=3 * n_hub)
        keys_h = jax.random.split(jax.random.PRNGKey(11), n_hub)
        obs_hub = jax.jit(jax.vmap(functools.partial(synth_obs, cfg=cfg)))(
            keys_h)
        k_ticks = 8
        obs_hub_c = jax.tree_util.tree_map(
            lambda x: jnp.stack([x] * k_ticks), obs_hub)
        extr_hub = jax.vmap(lambda _: Extrinsics.identity())(
            jnp.arange(n_hub))
        lo_holder = {"lo": sg.init_grid(),
                     "k": jax.device_put(jax.random.PRNGKey(5))}

        def run6():
            # key created once outside the timed loop (same dispatch-hygiene
            # reasoning as config 5); call_chunk folds it per tick.
            lo, occ, _d = sg.call_chunk(lo_holder["lo"], obs_hub_c,
                                        extr_hub, lo_holder["k"])
            lo_holder["lo"] = lo
            return lo

        results["world_grid_ticks_per_sec"] = time_chunks(
            run6, unit_count=k_ticks)
        results["world_grid_rig_frames_per_sec"] = (
            results["world_grid_ticks_per_sec"] * n_hub)
        log(f"config6 {results['world_grid_ticks_per_sec']:.0f} world "
            f"ticks/s ({n_hub} rigs fused/tick, k={k_ticks} scan-chained)")

    # BASELINE.json tracked metric: every fused frame updates the whole
    # 500x200 grid (decay + hits + clamp + sigmoid per cell)
    h, w = cfg.grid_size
    if "fused_frames_per_sec" in results:
        results["cells_updated_per_sec"] = (
            results["fused_frames_per_sec"] * h * w)
    results["n_rigs"] = args.rigs
    results["backend"] = jax.default_backend()
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
