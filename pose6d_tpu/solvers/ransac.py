"""Vectorized correspondence-RANSAC pose estimation (fully on device).

Replaces Open3D's registration_ransac_based_on_correspondence
(reference scripts/test_RANSAC.py:288-310: ransac_n=4, distance
threshold 0.05, 80k iterations; test_RANSAC.py:309 allows up to 4M
validation checks). Open3D runs a sequential C++ trial loop with an
adaptive confidence-based early exit; here the same criterion drives a
`lax.while_loop` over *blocks* of hypotheses, each block drawn, solved
(batched Kabsch via vmap) and scored (blocked inlier counting on the
MXU) as one fused step. The loop stops as soon as the best hypothesis's
estimated inlier ratio eps implies the standard RANSAC trial bound

    T(eps) = log(1 - confidence) / log(1 - eps**sample_size)

has been exceeded, or when `n_hypotheses` (the hard budget) is
exhausted. At high inlier ratios this exits after one block; at the
reference's real-data ratios (~0.1, BASELINE.md) it keeps drawing up to
the full budget, matching Open3D's semantics instead of a fixed small
parallel draw. A final least-squares refit on the best hypothesis's
inliers mirrors Open3D's local refinement.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .kabsch import kabsch_umeyama, transform_residuals, triad_rigid


@functools.partial(jax.jit,
                   static_argnames=("n_hypotheses", "sample_size",
                                    "refit_rounds", "hyp_block"))
def ransac_pose(key, src, dst, valid, threshold: float = 0.05,
                n_hypotheses: int = 131072, sample_size: int = 3,
                refit_rounds: int = 2, hyp_block: int = 1024,
                confidence: float = 0.999):
    """Robust (R, t) from putative correspondences.

    Args:
      key: PRNG key.
      src (N, 3): CAD-side coordinates per correspondence.
      dst (N, 3): PC-side coordinates.
      valid (N,): correspondence validity mask.
      threshold: inlier distance threshold (same units as coords).
      n_hypotheses: hard trial budget (static); the adaptive criterion
        usually exits far earlier.
      confidence: RANSAC success confidence for the early-exit bound.

    Returns dict: R (3,3), t (3,), inliers (N,) bool, n_inliers,
    n_trials (trials actually drawn), ok.
    """
    f32 = jnp.float32
    src = src.astype(f32)
    dst = dst.astype(f32)
    hyp_block = min(hyp_block, n_hypotheses)
    n_blocks = -(-n_hypotheses // hyp_block)
    n_valid = jnp.maximum(jnp.sum(valid.astype(f32)), 1.0)
    vmask = valid.astype(f32)
    # valid indices compacted to the front (argsort of the inverted
    # mask is stable, so order within the valid set is preserved);
    # drawing uniform ints into this table replaces the old
    # jax.random.categorical draw, whose Gumbel trick materialized a
    # (hyp_block, sample_size, N) tensor per block.
    valid_idx = jnp.argsort(~valid)
    n_valid_i = jnp.sum(valid).astype(jnp.int32)

    def solve_one(idx):
        # minimal 3-point triad: closed-form, no per-hypothesis
        # eigensolve (the measured RANSAC-stage bottleneck on TPU; see
        # kabsch.triad_rigid). 3-point sampling also tightens the
        # adaptive bound: success prob eps^3 vs eps^4 per trial.
        if sample_size == 3:
            return triad_rigid(src[idx], dst[idx])
        return kabsch_umeyama(src[idx], dst[idx])

    def run_block(key):
        """Draw, solve and score one block; return its best hypothesis."""
        u = jax.random.uniform(key, (hyp_block, sample_size))
        slots = (u * n_valid_i.astype(f32)).astype(jnp.int32)
        slots = jnp.minimum(slots, jnp.maximum(n_valid_i - 1, 0))
        samples = valid_idx[slots]
        Rs, ts = jax.vmap(solve_one)(samples)       # (B,3,3), (B,3)
        # Residual scoring with the K=3 contraction unrolled into
        # (block, N) planes: einsum("hij,nj->hni") materialized a
        # (block, N, 3) tensor through a 3-wide dot_general that XLA
        # pads onto the MXU — measured 160 ms/block on v5e, ~100x off
        # SoL, and the dominant cost of the whole RANSAC stage
        # (docs/prof_tpu/stage_summary_postfix.json). The unrolled form
        # is 9 broadcast FMAs on the VPU with (block, N) peak memory.
        d2 = jnp.zeros((Rs.shape[0], src.shape[0]), f32)
        for i in range(3):
            pred_i = (Rs[:, i, 0, None] * src[None, :, 0]
                      + Rs[:, i, 1, None] * src[None, :, 1]
                      + Rs[:, i, 2, None] * src[None, :, 2]
                      + ts[:, i, None])
            d2 = d2 + (pred_i - dst[None, :, i]) ** 2
        counts = jnp.sum((d2 < threshold * threshold) * vmask[None], axis=1)
        b = jnp.argmax(counts)
        return Rs[b], ts[b], counts[b]

    def required_trials(best_count):
        eps = jnp.clip(best_count / n_valid, 0.0, 1.0)
        p_good = jnp.clip(eps ** sample_size, 1e-12, 1.0 - 1e-7)
        return jnp.log1p(-confidence) / jnp.log1p(-p_good)

    def cond(state):
        key, R, t, best, done = state
        return (done < n_blocks) & (done * hyp_block < required_trials(best))

    def body(state):
        key, R, t, best, done = state
        key, sub = jax.random.split(key)
        Rb, tb, cb = run_block(sub)
        better = cb > best
        R = jnp.where(better, Rb, R)
        t = jnp.where(better, tb, t)
        best = jnp.maximum(best, cb)
        return key, R, t, best, done + 1

    state0 = (key, jnp.eye(3, dtype=f32), jnp.zeros(3, f32),
              jnp.asarray(0.0, f32), jnp.asarray(0, jnp.int32))
    _, R, t, _, done = jax.lax.while_loop(cond, body, state0)

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
            "n_trials": done * hyp_block, "ok": n_inl >= 3}
