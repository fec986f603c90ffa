"""Vectorized correspondence-RANSAC pose estimation (fully on device).

Replaces Open3D's registration_ransac_based_on_correspondence
(reference scripts/test_RANSAC.py:288-310: ransac_n=4, distance
threshold 0.05, 80k iterations). Instead of a sequential C++ loop with
early termination, all hypotheses are drawn, solved (batched Kabsch via
vmap), and scored (blocked inlier counting on the MXU) in one jitted
program; a final least-squares refit on the best hypothesis's inliers
mirrors Open3D's local refinement. 80k sequential trials on 4-point
samples are statistically equivalent to the default 8192 parallel
hypotheses here (the success probability saturates far earlier);
n_hypotheses is configurable where more are wanted.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .kabsch import kabsch_umeyama, transform_residuals


@functools.partial(jax.jit,
                   static_argnames=("n_hypotheses", "sample_size",
                                    "refit_rounds", "hyp_block"))
def ransac_pose(key, src, dst, valid, threshold: float = 0.05,
                n_hypotheses: int = 8192, sample_size: int = 4,
                refit_rounds: int = 2, hyp_block: int = 1024):
    """Robust (R, t) from putative correspondences.

    Args:
      key: PRNG key.
      src (N, 3): CAD-side coordinates per correspondence.
      dst (N, 3): PC-side coordinates.
      valid (N,): correspondence validity mask.
      threshold: inlier distance threshold (same units as coords).

    Returns dict: R (3,3), t (3,), inliers (N,) bool, n_inliers, ok.
    """
    n = src.shape[0]
    f32 = jnp.float32
    hyp_block = min(hyp_block, n_hypotheses)
    logits = jnp.where(valid, 0.0, -jnp.inf)
    # (H, S) correspondence indices sampled uniformly over valid pairs
    samples = jax.random.categorical(
        key, logits, shape=(n_hypotheses, sample_size))

    def solve_one(idx):
        return kabsch_umeyama(src[idx], dst[idx])

    Rs, ts = jax.vmap(solve_one)(samples)          # (H,3,3), (H,3)

    vmask = valid.astype(f32)

    def score_block(carry, j):
        sl = jax.lax.dynamic_slice_in_dim
        Rb = sl(Rs, j * hyp_block, hyp_block, axis=0)
        tb = sl(ts, j * hyp_block, hyp_block, axis=0)
        pred = jnp.einsum("hij,nj->hni", Rb, src) + tb[:, None, :]
        d2 = jnp.sum((pred - dst[None]) ** 2, axis=-1)
        counts = jnp.sum((d2 < threshold * threshold) * vmask[None], axis=1)
        return carry, counts

    _, counts = jax.lax.scan(score_block, None,
                             jnp.arange(n_hypotheses // hyp_block))
    counts = counts.reshape(-1)
    best = jnp.argmax(counts)
    R, t = Rs[best], ts[best]

    # Local refinement: least-squares refit on the inlier set, iterated.
    def refit(state, _):
        R, t = state
        r = transform_residuals(R, t, src, dst)
        w = ((r < threshold) & valid).astype(f32)
        R2, t2 = kabsch_umeyama(src, dst, w)
        # keep previous pose if the inlier set collapsed
        ok = jnp.sum(w) >= 3
        R2 = jnp.where(ok, R2, R)
        t2 = jnp.where(ok, t2, t)
        return (R2, t2), None

    (R, t), _ = jax.lax.scan(refit, (R, t), None, length=refit_rounds)
    r = transform_residuals(R, t, src, dst)
    inliers = (r < threshold) & valid
    n_inl = jnp.sum(inliers)
    return {"R": R, "t": t, "inliers": inliers, "n_inliers": n_inl,
            "ok": n_inl >= 3}
