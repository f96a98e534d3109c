"""Interleaved A/B: exact-kNN top_k merge vs the legacy argmin chain,
on the suite's config-5 shape (64-rig exact fleet step, outputs live).

The chunked streaming exact kNN (ops/association.knn_median_depth)
originally extracted each of the k neighbors with an argmin + two
take_along_axis gathers + an iota-compare re-mask; at fleet batch
sizes those lowered to a ~40 us/frame select_n pile (round-3 honest
profile). The top_k variant replaces the per-chunk chain with ONE
lax.top_k + one gather — identical results including tie order
(tests/test_association.py::test_knn_topk_tie_equivalence).

Variant "chain" is reconstructed here by monkeypatching the legacy
implementation in at trace time; the shipped code path is "topk".

Same pairwise median-of-windows hygiene as tools/bench_stem_ab.py.

Usage: python tools/bench_knn_ab.py [--rigs 64] [--groups 6]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_chain_impl(jnp, jax):
    """The pre-round-3-close argmin-chain exact kNN (legacy variant)."""

    def knn_median_depth_chain(uvd, uvd_valid, boxes, k):
        centers = boxes.centers()
        d = centers.shape[0]
        p = uvd.shape[0]
        chunk = min(p, 2048)
        n_chunks = -(-p // chunk)
        best_d = jnp.full((d, k), jnp.inf)
        best_z = jnp.full((d, k), jnp.inf)
        cols = jnp.arange(k + chunk, dtype=jnp.int32)
        for c in range(n_chunks):
            lo = c * chunk
            uc = jax.lax.dynamic_slice_in_dim(uvd, lo, chunk, axis=0)
            mc = jax.lax.dynamic_slice_in_dim(uvd_valid, lo, chunk, axis=0)
            d2c = (jnp.sum((centers[:, None, :] - uc[None, :, :2]) ** 2,
                           axis=-1) + uc[None, :, 2] ** 2)
            d2c = jnp.where(mc[None, :], d2c, jnp.inf)
            cat_d = jnp.concatenate([best_d, d2c], axis=-1)
            cat_z = jnp.concatenate(
                [best_z, jnp.broadcast_to(uc[None, :, 2], d2c.shape)],
                axis=-1)
            nd, nz = [], []
            cur = cat_d
            for _ in range(k):
                j = jnp.argmin(cur, axis=-1)
                nd.append(jnp.take_along_axis(cur, j[:, None],
                                              axis=-1)[:, 0])
                nz.append(jnp.take_along_axis(cat_z, j[:, None],
                                              axis=-1)[:, 0])
                cur = jnp.where(cols[None, :] == j[:, None], jnp.inf, cur)
            best_d = jnp.stack(nd, axis=-1)
            best_z = jnp.stack(nz, axis=-1)
        neighbor_ok = jnp.isfinite(best_d)
        n_found = jnp.sum(neighbor_ok.astype(jnp.int32), axis=-1)
        depths = jnp.where(neighbor_ok, best_z, jnp.inf)
        depths_sorted = jnp.sort(depths, axis=-1)
        mid = jnp.clip(n_found // 2, 0, k - 1)
        median = jnp.take_along_axis(depths_sorted, mid[:, None],
                                     axis=-1)[:, 0]
        return jnp.where(n_found > 0, median, -1.0)

    return knn_median_depth_chain


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rigs", type=int, default=64)
    ap.add_argument("--scan", type=int, default=8)
    ap.add_argument("--groups", type=int, default=6)
    ap.add_argument("--calls", type=int, default=6)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from grid_vision_tpu import pipeline
    from grid_vision_tpu.config import GridVisionConfig
    from grid_vision_tpu.ops import association
    from grid_vision_tpu.types import GridState, Obs
    from bench import (apply_perturbation, draw_perturbations, readback,
                       synth_obs, output_digest)

    cfg = GridVisionConfig(max_points=8192, compute_dtype="bfloat16")
    eng = pipeline.Engine(cfg, seed=0)

    keys = jax.random.split(jax.random.PRNGKey(0), args.rigs)
    obs_b = jax.jit(jax.vmap(functools.partial(synth_obs, cfg=cfg)))(keys)
    obs_b = Obs(image=obs_b.image.astype(jnp.bfloat16),
                cloud=obs_b.cloud, has_image=obs_b.has_image,
                has_cloud=obs_b.has_cloud)

    def make_chunk():
        budget = 5 * args.rigs
        fstep = functools.partial(pipeline.fleet_step, cfg=cfg,
                                  orientation_budget=budget)

        @functools.partial(jax.jit, donate_argnums=(1,))
        def fleet_chunk(params, states, obs, extr, key):
            key, sub = jax.random.split(key)
            br, ji = draw_perturbations(sub, args.scan, args.rigs)

            def body(carry, bj):
                s, acc = carry
                o = apply_perturbation(obs, bj[0], bj[1])
                s2, out = fstep(params, s, o, extr)
                return (s2, acc + output_digest(out)), ()

            (states, acc), _ = jax.lax.scan(
                body, (states, jnp.zeros((), jnp.float32)), (br, ji))
            return states, acc, key

        return fleet_chunk

    shipped = association.knn_median_depth
    chain = make_chain_impl(jnp, jax)
    run = {}
    for name in ("topk", "chain"):
        association.knn_median_depth = shipped if name == "topk" else chain
        chunk = make_chunk()
        states = GridState.create_batch(cfg, args.rigs)
        holder = {"s": states, "k": jax.device_put(jax.random.PRNGKey(3))}

        def runner(holder=holder, chunk=chunk):
            holder["s"], acc, holder["k"] = chunk(
                eng.params, holder["s"], obs_b, eng.extrinsics,
                holder["k"])
            return acc

        t0 = time.perf_counter()
        _ = readback(runner())  # trace under the patch + compile + settle
        log(f"[{name}] compile+settle {time.perf_counter() - t0:.1f}s")
        run[name] = runner
    association.knn_median_depth = shipped

    _ = readback(run["topk"]())
    t = time.perf_counter()
    _ = readback(run["topk"]())
    sync = time.perf_counter() - t

    rates = {n: [] for n in run}
    for g in range(args.groups):
        for name in run:
            t0 = time.perf_counter()
            for _ in range(args.calls):
                out = run[name]()
            _ = readback(out)
            dt = time.perf_counter() - t0 - sync
            if dt > 0:
                fps = args.rigs * args.scan * args.calls / dt
                rates[name].append(fps)
                log(f"group {g} {name:6s} {fps:8.0f} fused fps")
    for name, rs in rates.items():
        if not rs:
            print(f"{name}: no valid windows (every dt <= sync)")
            continue
        med = float(np.median(rs))
        print(f"{name}: median {med:.0f} fused fps over {len(rs)} "
              f"windows (min {min(rs):.0f} max {max(rs):.0f})")


if __name__ == "__main__":
    main()
