"""Point-to-point ICP as a fixed-iteration lax.scan (on device).

Replaces Open3D registration_icp with TransformationEstimationPointToPoint
(reference scripts/test_RANSAC.py:443-446: max_correspondence_distance
0.2, up to 2000 iterations). Each iteration: nearest-neighbor pairing of
the transformed source against the target (blocked cdist argmin on the
MXU), distance-gated Kabsch update. Fixed iteration count keeps the
program static; ICP on these shapes converges in far fewer steps than
the reference's 2000-iteration cap, and iterations after convergence are
idempotent (same correspondence set -> same pose).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .kabsch import kabsch_umeyama


@functools.partial(jax.jit, static_argnames=("max_iter", "block",
                                             "coarse_stride",
                                             "fine_iters"))
def icp_point2point(src, src_valid, tgt, tgt_valid, R0, t0,
                    max_corr_dist: float = 0.2, max_iter: int = 50,
                    block: int = 1024, coarse_stride: int = 1,
                    fine_iters: int = 5):
    """Refine (R0, t0) aligning src onto tgt.

    src (N, 3), tgt (M, 3) padded with validity masks.

    coarse_stride > 1 enables coarse-to-fine NN: all but the last
    `fine_iters` iterations match against every coarse_stride-th target
    point (the per-iteration NN over the full N x M table is the
    measured ICP cost on TPU — docs/prof_tpu/ r5 trace), then the final
    iterations and the reported rmse/n_corr run full-resolution. The
    early iterations only need correspondences good enough to shrink
    the basin, which a 4x-subsampled model surface provides.
    Returns dict R, t, rmse, n_corr.
    """
    f32 = jnp.float32
    src = src.astype(f32)
    tgt = tgt.astype(f32)

    def nn_pairs(R, t, tg, tv):
        from ..ops.nn import nearest_valid
        moved = src @ R.T + t
        dmin, j = nearest_valid(moved, tg, tv)
        w = (src_valid & (dmin < max_corr_dist ** 2)).astype(f32)
        return j, w, dmin

    def make_step(tg, tv):
        def step(state, _):
            R, t = state
            j, w, _ = nn_pairs(R, t, tg, tv)
            ok = jnp.sum(w) >= 3
            R2, t2 = kabsch_umeyama(src, tg[j], w)
            R2 = jnp.where(ok, R2, R)
            t2 = jnp.where(ok, t2, t)
            return (R2, t2), None
        return step

    state = (R0.astype(f32), t0.astype(f32))
    n_fine = max_iter if coarse_stride <= 1 else min(fine_iters, max_iter)
    n_coarse = max_iter - n_fine
    if n_coarse > 0:
        state, _ = jax.lax.scan(
            make_step(tgt[::coarse_stride], tgt_valid[::coarse_stride]),
            state, None, length=n_coarse)
    (R, t), _ = jax.lax.scan(make_step(tgt, tgt_valid), state, None,
                             length=n_fine)
    j, w, dmin = nn_pairs(R, t, tgt, tgt_valid)
    n_corr = jnp.sum(w)
    rmse = jnp.sqrt(jnp.sum(dmin * w) / jnp.maximum(n_corr, 1.0))
    return {"R": R, "t": t, "rmse": rmse, "n_corr": n_corr}


@functools.partial(jax.jit, static_argnames=("max_iter", "block",
                                             "coarse_stride",
                                             "fine_iters"))
def icp_cloud_to_model(cad_xyz, cad_valid, pc_xyz, pc_valid, R0, t0,
                       max_corr_dist: float = 0.2, max_iter: int = 50,
                       block: int = 1024, coarse_stride: int = 1,
                       fine_iters: int = 5):
    """Partial-view pose refinement: match OBSERVED points onto the CAD.

    icp_point2point(src=CAD, tgt=PC) is biased for partial views: CAD
    points on unobserved/oblique surface regions pair with the nearest
    visible-shell point within the gate and drag the pose toward the
    camera (measured: ~2 cm z-drift from a ground-truth init at
    production shapes, i.e. ICP *leaves* the true pose). Matching the
    sensor cloud onto the model instead is bias-free — every observed
    point genuinely lies on the CAD surface — so ICP from the true pose
    stays put (measured drift: 0.05 cm / 0.4 deg on the same frames).

    Internally aligns pc -> model frame with the standard scan, then
    inverts back to a model->camera pose. Use this whenever the ICP
    target is the sensor cloud (production path); full-to-full
    refinement against a GT-posed CAD (the reference's protocol target,
    scripts/test_RANSAC.py:443-446) is unbiased either way and keeps
    using icp_point2point.
    """
    f32 = jnp.float32
    R0 = R0.astype(f32)
    t0 = t0.astype(f32)
    out = icp_point2point(pc_xyz, pc_valid, cad_xyz, cad_valid,
                          R0.T, -R0.T @ t0,
                          max_corr_dist=max_corr_dist,
                          max_iter=max_iter, block=block,
                          coarse_stride=coarse_stride,
                          fine_iters=fine_iters)
    Rm, tm = out["R"], out["t"]
    return {"R": Rm.T, "t": -Rm.T @ tm, "rmse": out["rmse"],
            "n_corr": out["n_corr"]}
