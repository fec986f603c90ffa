"""Weighted Kabsch/Umeyama rigid alignment (closed form, vmappable).

The SVD-based estimator underlying every pose stage (RANSAC hypotheses,
ICP updates, GNC iterations) — the TPU-native replacement for Open3D's
TransformationEstimationPointToPoint (reference scripts/test_RANSAC.py:306).
"""
from __future__ import annotations

import jax.numpy as jnp


def kabsch_umeyama(src, dst, weights=None):
    """Rigid (R, t) minimizing sum_i w_i ||R src_i + t - dst_i||^2.

    src, dst (N, 3); weights (N,) nonnegative (mask or soft weights).
    Returns R (3,3), t (3,). Degenerate inputs (all-zero weights or rank
    deficiency) return a finite, valid rotation rather than NaN.
    """
    f32 = jnp.float32
    src = src.astype(f32)
    dst = dst.astype(f32)
    if weights is None:
        w = jnp.ones(src.shape[0], f32)
    else:
        w = weights.astype(f32)
    wsum = jnp.maximum(jnp.sum(w), 1e-8)
    wn = (w / wsum)[:, None]
    mu_s = jnp.sum(src * wn, axis=0)
    mu_d = jnp.sum(dst * wn, axis=0)
    H = (src - mu_s).T @ ((dst - mu_d) * wn)        # (3, 3)
    # Tiny jitter keeps SVD well-behaved on degenerate (e.g. all-masked)
    # inputs without visibly perturbing real solutions.
    H = H + 1e-12 * jnp.eye(3, dtype=f32)
    U, _, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(Vt.T @ U.T)
    S = jnp.diag(jnp.array([1.0, 1.0, 1.0], f32)).at[2, 2].set(jnp.sign(det))
    R = Vt.T @ S @ U.T
    t = mu_d - R @ mu_s
    return R, t


def transform_residuals(R, t, src, dst):
    """Per-point Euclidean residuals ||R src + t - dst||."""
    pred = src @ R.T + t
    return jnp.linalg.norm(pred - dst, axis=-1)
