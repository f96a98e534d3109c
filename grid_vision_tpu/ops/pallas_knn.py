"""Pallas TPU kernel: k-NN median depth in one VMEM pass.

The XLA formulation of knn_median_depth (association.py) re-reads /
recomputes the (D, P) distance matrix for every one of the k argmin
passes; the profiler shows that reduce chain as the single largest op in
the fused step (~62 us/frame, tools/profile_step.py). This kernel
computes the distance matrix once into VMEM (D x P f32 = 2 MB at the
default capacities) and runs all k extraction passes on-chip, so HBM
sees only the (P, 3) uvd points and the (D, k) outputs.

Semantics identical to association.knn_median_depth (the reference's
computeDepthForBoundingBoxes, cloud_detections.cpp:43-87), including the
3D distance metric quirk and the n//2 upper median. Depth recovery uses
a masked-min pass per extraction instead of a dynamic gather (gathers
are the slow path this kernel exists to avoid).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import Boxes

_BIG = 3.0e38  # f32 "infinity" stand-in that survives arithmetic


def _knn_kernel(uvd_ref, valid_ref, centers_ref,
                depths_ref, count_ref, *, k: int):
    """One program: all boxes vs all points.

    uvd: (P, 3); valid: (P, 1) f32 0/1; centers: (D, 2);
    outputs depths (D, k), count (D, 1) f32.
    """
    uvd = uvd_ref[:]                                    # (P, 3)
    pvalid = valid_ref[:][:, 0]                         # (P,)
    centers = centers_ref[:]                            # (D, 2)

    du = centers[:, 0:1] - uvd[None, :, 0].reshape(1, -1)   # (D, P)
    dv = centers[:, 1:2] - uvd[None, :, 1].reshape(1, -1)
    depth = uvd[None, :, 2].reshape(1, -1)                  # (1, P)
    d2 = du * du + dv * dv + depth * depth
    d2 = jnp.where(pvalid[None, :] > 0, d2, _BIG)

    cnt = jnp.zeros((centers.shape[0], 1), jnp.float32)
    cur = d2
    for i in range(k):
        vmin = jnp.min(cur, axis=-1, keepdims=True)         # (D, 1)
        found = vmin < _BIG
        # depth of (the first) point achieving the min
        is_min = cur == vmin
        depth_i = jnp.min(jnp.where(is_min, jnp.broadcast_to(
            depth, cur.shape), _BIG), axis=-1, keepdims=True)
        depths_ref[:, i:i + 1] = jnp.where(found, depth_i, _BIG)
        cnt = cnt + found.astype(jnp.float32)
        # mask exactly one occurrence: the one holding the min depth too
        # (ties in d2 with different depths: the reference's FLANN order
        # is unspecified; removing the min-depth instance is a fixed,
        # deterministic choice)
        remove = is_min & (jnp.broadcast_to(depth, cur.shape) == depth_i)
        # only the first such column: cumulative trick — keep columns
        # where a prior column already matched
        first = jnp.cumsum(remove.astype(jnp.float32), axis=-1) == 1.0
        cur = jnp.where(remove & first, _BIG, cur)
    count_ref[:] = cnt


def knn_median_depth_pallas(uvd: jnp.ndarray, uvd_valid: jnp.ndarray,
                            boxes: Boxes, k: int) -> jnp.ndarray:
    """Drop-in replacement for association.knn_median_depth."""
    p = uvd.shape[0]
    d = boxes.capacity
    centers = boxes.centers()

    kernel = functools.partial(_knn_kernel, k=k)
    depths, counts = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((d, k), jnp.float32),
            jax.ShapeDtypeStruct((d, 1), jnp.float32),
        ],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        interpret=jax.default_backend() != "tpu",
    )(uvd, uvd_valid.astype(jnp.float32)[:, None], centers)

    n_found = counts[:, 0].astype(jnp.int32)
    depths_sorted = jnp.sort(depths, axis=-1)       # _BIG pads sort last
    mid = jnp.clip(n_found // 2, 0, k - 1)
    median = jnp.take_along_axis(depths_sorted, mid[:, None], axis=-1)[:, 0]
    return jnp.where(n_found > 0, median, -1.0)
