"""Dump the optimized HLO of the bench fleet chunk and locate named
fusions from a tools/profile_step.py trace.

Usage:
  python tools/dump_hlo.py [--rigs 64] [--scan 8] [--knn xla]
      [--name convolution_convert_fusion.3 --name compare_select_fusion.71]

With --name, prints each named computation's body (the fused ops and
shapes); without, writes the full optimized HLO to --out and prints a
shape summary of all convolution/compare_select fusions.
"""

from __future__ import annotations

import argparse
import functools
import re
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rigs", type=int, default=64)
    ap.add_argument("--scan", type=int, default=8)
    ap.add_argument("--knn", default="xla")
    ap.add_argument("--stem", default="pallas")
    ap.add_argument("--name", action="append", default=[])
    ap.add_argument("--out", default="/tmp/gv_hlo.txt")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from grid_vision_tpu import pipeline
    from grid_vision_tpu.config import GridVisionConfig
    from grid_vision_tpu.types import GridState
    from bench import apply_perturbation, build_obs_pool, draw_perturbations, output_digest

    cfg = GridVisionConfig(max_points=8192, compute_dtype="bfloat16",
                           knn_backend=args.knn,
                           detector_stem_backend=args.stem,
                           detection_weights_file="weights/detector.npz",
                           vision_weights_file="weights/orientation.npz")
    eng = pipeline.Engine(cfg, seed=0)
    pool = build_obs_pool(cfg, args.rigs)
    budget = 5 * args.rigs

    @functools.partial(jax.jit, donate_argnums=(1,))
    def chunk(params, states, pool, extr, key):
        bright_t, jitter_t = draw_perturbations(key, args.scan, args.rigs)

        def body(carry, bj):
            s, acc = carry
            obs = apply_perturbation(pool, bj[0], bj[1])
            s2, out = pipeline.fleet_step(params, s, obs, extr, cfg,
                                          orientation_budget=budget)
            # outputs stay live (bench.output_digest): profile the
            # program production runs, not a dead-coded subset
            return (s2, acc + output_digest(out)), ()
        (states, acc), _ = jax.lax.scan(
            body, (states, jnp.zeros((), jnp.float32)),
            (bright_t, jitter_t))
        return states, acc

    states = GridState.create_batch(cfg, args.rigs)
    compiled = chunk.lower(eng.params, states, pool, eng.extrinsics,
                           jax.random.PRNGKey(0)).compile()
    txt = compiled.as_text()
    with open(args.out, "w") as fh:
        fh.write(txt)
    print(f"optimized HLO -> {args.out} ({len(txt)} bytes)")

    if args.name:
        for name in args.name:
            # print the computation body for the fused instruction
            pat = re.compile(
                r"^%?" + re.escape(name.replace(".", ".")) + r"\b")
            # fusion instruction line names its called computation
            for line in txt.splitlines():
                if re.search(r"\b" + re.escape(name) + r"\s*=", line):
                    print("\n== instr:", line.strip()[:400])
                    m = re.search(r"calls=([%\w.\-]+)", line)
                    if m:
                        comp = m.group(1).lstrip("%")
                        inside = False
                        for l2 in txt.splitlines():
                            if re.match(rf"%?{re.escape(comp)}\b", l2):
                                inside = True
                            if inside:
                                print(l2[:240])
                                if l2.startswith("}"):
                                    break
                    break
    else:
        for line in txt.splitlines():
            m = re.match(r"\s+%?((convolution|compare_select)[\w.]*) = "
                         r"(\S+) fusion", line)
            if m:
                print(m.group(1), m.group(3), line.strip()[:200])


if __name__ == "__main__":
    main()
