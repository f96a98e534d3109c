"""Tracker quality report: MOT metrics over scripted replays.

Runs train/eval_tracking's crossing/occlusion/churn scenarios through
the production tracker (ops/tracking.update_tracks — the same function
Fleet.tracked_step and `serve --track` dispatch) and prints the
CLEAR-MOT aggregates for docs/QUALITY.md, with the greedy-vs-Hungarian
matcher A/B and the coast-length (max_misses) sweep that justifies the
production default.

Usage: python tools/eval_tracking_report.py [--seeds 4] [--frames 250]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=4)
    ap.add_argument("--frames", type=int, default=250)
    ap.add_argument("--sweep-misses", action="store_true",
                    help="also sweep max_misses (the coast-length A/B)")
    ap.add_argument("--forecast", action="store_true",
                    help="also run the predictive-occupancy "
                         "calibration (forecast vs realized future "
                         "occupancy; docs/QUALITY.md forecast table)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from grid_vision_tpu.config import GridVisionConfig
    from grid_vision_tpu.ops.tracking import TrackConfig
    from grid_vision_tpu.train import eval_tracking as et

    cfg = GridVisionConfig(use_vision_orientation=False)
    seeds = tuple(range(args.seeds))
    report = {"n_frames": args.frames, "scenarios": args.seeds,
              "scenario": "3 same-class crossing pairs + lateral "
                          "occluder + spawn/kill churn; Markov "
                          "occlusion episodes, 5% dropout, 1.5 px box "
                          "jitter, false positives"}
    for m in ("greedy", "hungarian"):
        agg = et.evaluate(seeds=seeds, n_frames=args.frames, matcher=m,
                          cfg=cfg)
        report[m] = agg
        print(f"[{m}] mota {agg['mota']:.3f}  idf1 {agg['idf1']:.3f}  "
              f"idsw {agg['id_switches']:.0f}  frag "
              f"{agg['fragments']:.0f}  fn {agg['fn']:.0f}  "
              f"fp {agg['fp']:.0f}  / {agg['n_gt']:.0f} GT",
              file=sys.stderr, flush=True)

    if args.sweep_misses:
        objs = et.make_crossing_scenario(0, args.frames)
        f = et.simulate(objs, cfg, args.frames, seed=0)
        sweep = {}
        for mm in (3, 5, 10, 15, 25):
            snaps = et.run_tracker(f, cfg, TrackConfig(max_misses=mm))
            sweep[mm] = et.mot_metrics(f, snaps)
            print(f"[max_misses={mm}] mota {sweep[mm]['mota']:.3f} "
                  f"fp {sweep[mm]['fp']} idsw "
                  f"{sweep[mm]['id_switches']}",
                  file=sys.stderr, flush=True)
        report["max_misses_sweep"] = sweep

    if args.forecast:
        import numpy as np
        rows = {}
        for seed in seeds[:2]:
            objs = et.make_crossing_scenario(seed, args.frames)
            f = et.simulate(objs, cfg, args.frames, seed=seed)
            snaps = et.run_tracker(f, cfg, TrackConfig())
            cal = et.forecast_calibration(f, snaps, cfg, TrackConfig(),
                                          stride=5)
            for h, r in cal.items():
                rows.setdefault(h, []).append(r)
        report["forecast_calibration"] = {
            str(h): {
                "brier": float(np.mean([r["brier"] for r in rs])),
                "brier_persistence": float(np.mean(
                    [r["brier_persistence"] for r in rs])),
                "skill_vs_persistence": float(np.mean(
                    [r["skill_vs_persistence"] for r in rs])),
                "hit_rate": float(np.mean([r["hit_rate"] for r in rs])),
                "precision": float(np.mean(
                    [r["precision"] for r in rs])),
                "reliability_seed0": rs[0]["reliability"],
            } for h, rs in rows.items()}
        for h, r in report["forecast_calibration"].items():
            print(f"[forecast h={h}] brier {r['brier']:.4f} vs "
                  f"persist {r['brier_persistence']:.4f} "
                  f"(skill {r['skill_vs_persistence']:+.3f})  hit "
                  f"{r['hit_rate']:.2f}  prec {r['precision']:.2f}",
                  file=sys.stderr, flush=True)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
