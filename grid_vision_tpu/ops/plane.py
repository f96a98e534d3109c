"""Ground-plane segmentation: fixed-iteration parallel RANSAC.

TPU re-design of segmentGroundPlane (src/cloud_detections.cpp:105-138),
which runs pcl::SACSegmentation (SACMODEL_PLANE, SAC_RANSAC, distance
threshold 0.04, optimize-coefficients on) and removes the plane inliers
(setNegative(true)).

Instead of PCL's sequential adaptive RANSAC, all hypotheses are evaluated
in parallel: sample `iters` triplets of points, fit `iters` candidate
planes, count inliers for all of them in one (iters, P) distance matrix,
pick the best, least-squares refine on its inliers (PCL's
optimizeModelCoefficients = smallest-eigenvector plane fit), then
re-select inliers against the refined plane. Deterministic given the PRNG
key (the reference is nondeterministic across runs anyway — rand()).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _plane_from_triplet(p0, p1, p2):
    """Plane (unit normal n, offset d) through 3 points: n.p + d = 0."""
    n = jnp.cross(p1 - p0, p2 - p0)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    ok = norm[..., 0] > 1e-8  # collinear triplets are invalid hypotheses
    n = n / jnp.where(norm == 0, 1.0, norm)
    d = -jnp.sum(n * p0, axis=-1)
    return n, d, ok


def _refine_plane(xyz: jnp.ndarray, weights: jnp.ndarray):
    """Least-squares plane over weighted points: normal = eigenvector of
    the smallest eigenvalue of the weighted covariance (PCL's
    optimizeModelCoefficients semantics)."""
    wsum = jnp.maximum(jnp.sum(weights), 1e-9)
    mean = jnp.sum(xyz * weights[:, None], axis=0) / wsum
    centered = (xyz - mean) * weights[:, None]
    cov = centered.T @ (xyz - mean) / wsum
    _, vecs = jnp.linalg.eigh(cov)  # ascending eigenvalues
    n = vecs[:, 0]
    d = -jnp.dot(n, mean)
    return n, d


def segment_ground_plane(xyz: jnp.ndarray, valid: jnp.ndarray,
                         rng: jnp.ndarray, iters: int,
                         distance_threshold: float):
    """Returns (non_ground_mask, plane (4,), ok).

    non_ground_mask: valid points NOT on the best plane (the reference's
    setNegative(true) extraction). If no plane can be fit (fewer than 3
    valid points or all hypotheses degenerate), ok=False and
    non_ground_mask is all-False — mirroring the reference's empty-cloud
    return on failure (:122-126), which makes computeBBoxPose yield no
    poses (:308-309).
    """
    p = xyz.shape[0]
    count = jnp.sum(valid.astype(jnp.int32))
    # Sample triplet indices uniformly from the valid prefix (points are
    # packed valid-first by the ingest layer).
    u = jax.random.uniform(rng, (iters, 3))
    idx = jnp.floor(u * jnp.maximum(count, 1)).astype(jnp.int32)
    idx = jnp.clip(idx, 0, p - 1)
    tri = xyz[idx]                                           # (iters, 3, 3)
    n, d, hyp_ok = _plane_from_triplet(tri[:, 0], tri[:, 1], tri[:, 2])

    dist = jnp.abs(xyz @ n.T + d[None, :])                   # (P, iters)
    inlier = (dist < distance_threshold) & valid[:, None]
    scores = jnp.sum(inlier.astype(jnp.int32), axis=0)
    scores = jnp.where(hyp_ok, scores, -1)
    best = jnp.argmax(scores)

    best_inlier = inlier[:, best]
    n_ref, d_ref = _refine_plane(xyz, best_inlier.astype(jnp.float32))
    dist_ref = jnp.abs(xyz @ n_ref + d_ref)
    final_inlier = (dist_ref < distance_threshold) & valid

    ok = (count >= 3) & (scores[best] > 0)
    non_ground = valid & ~final_inlier & ok
    plane = jnp.concatenate([n_ref, d_ref[None]])
    return non_ground, plane, ok
