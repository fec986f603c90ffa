"""Functional map -> point-to-point correspondence solvers (on device).

Equivalents of the reference's fmap2pointmap_solvers/ (naive.py:5-35,
spacial_filtering.py:4-75), rebuilt fixed-shape and masked:

* naive: argmin_i || (Phi_x C^T)_i - Phi_y_j || per PC point j.
* spatial filtering: top-K=5 CAD candidates per PC point, then three
  rounds of pairwise-distance spatial-consistency pruning at
  {0.30, 0.15, 0.055 (fallback 0.065)} x diam(CAD). The reference
  materializes a P x P distance matrix per round (P = 5*V2 ~ 10k,
  ~400 MB); here each round streams column blocks through a lax.scan
  so peak memory is P x block.

Correspondences are returned as fixed-size index arrays plus a validity
mask (never ragged), ready for the vectorized RANSAC/GNC pose stage.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.geometry import pairwise_sqdist
from ..ops.masking import BIG


@jax.jit
def naive_fmap2pointmap(C, evecs_x, evecs_y, x_valid, y_valid):
    """p2p map: each PC point j -> nearest CAD point in aligned spectral
    embedding (reference fmap2pointmap_solvers/naive.py:20-35).

    Returns pairs (2, V2) int32 rows [cad_idx, pc_idx], valid (V2,).
    """
    from ..ops.nn import nearest_valid
    emb_x = evecs_x @ C.T            # (V1, K)
    _, p2p = nearest_valid(evecs_y, emb_x, x_valid)
    pc_idx = jnp.arange(p2p.shape[0], dtype=jnp.int32)
    return jnp.stack([p2p, pc_idx]), y_valid


def _consistency_mean(coords_cad, coords_pc, row_valid,
                      row_subsample: int = 0):
    """mean_i |d(cad_i,cad_j) - d(pc_i,pc_j)| over valid rows i, per pair j.

    coords_* (P, 3) per-pair endpoint coordinates. With
    row_subsample > 0, the mean runs over a strided row subset instead
    of all P rows. NOTE: this is a *screening approximation*, not an
    unbiased estimate — with P = V2*k pairs in PC-major order and
    row_subsample = P/k, the stride picks exactly the rank-0 candidate
    rows, whose cleaner geometry systematically lowers the mean vs the
    reference's all-rows semantics (spacial_filtering.py:42-58).
    Measured pair-survival agreement with the exact filter is only
    0.68/0.93 (high/low inlier regimes), so the default is 0 (exact);
    see tests/test_solvers.py::TestRowSubsampleValidation.
    """
    P = coords_cad.shape[0]
    if row_subsample and row_subsample < P:
        stride = P // row_subsample
        idx = jnp.arange(row_subsample) * stride
        rows_cad = coords_cad[idx]
        rows_pc = coords_pc[idx]
        rw = row_valid[idx].astype(jnp.float32)[:, None]
    else:
        # exact path: on TPU, the fused Pallas kernel tiles both P x P
        # distance matrices through VMEM instead of materializing
        # 2 x 420 MB in HBM per pruning round
        rw1 = row_valid.astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(rw1), 1.0)
        if (jax.default_backend() == "tpu" and P % 1024 == 0):
            from ..ops.pallas import masked_consistency_sum
            return masked_consistency_sum(coords_cad, coords_pc,
                                          rw1) / denom
        rows_cad, rows_pc = coords_cad, coords_pc
        rw = rw1[:, None]
    denom = jnp.maximum(jnp.sum(rw), 1.0)
    hi = jax.lax.Precision.HIGH  # bf16x3 MXU passes; mean averages noise
    da = jnp.sqrt(pairwise_sqdist(rows_cad, coords_cad, precision=hi))
    db = jnp.sqrt(pairwise_sqdist(rows_pc, coords_pc, precision=hi))
    return jnp.sum(jnp.abs(da - db) * rw, axis=0) / denom


@functools.partial(jax.jit, static_argnames=("k", "row_subsample"))
def spatial_filtering_fmap2pointmap(C, evecs_x, evecs_y, cad_xyz, pc_xyz,
                                    x_valid, y_valid, diam_cad,
                                    k: int = 5, row_subsample: int = 0,
                                    taus=(0.3, 0.15, 0.055, 0.065)):
    """Top-k spectral candidates + multi-stage distance-consistency
    pruning.

    taus: pruning schedule as diam_cad fractions — every entry but the
    last two is a plain pruning round; the final pair is the
    (tight, loose-fallback) threshold of the last round (reference
    spacial_filtering.py:59-73 hardcodes (0.3, 0.15, 0.055, 0.065)).

    Returns pairs (2, V2*k) int32 rows [cad_idx, pc_idx], valid (V2*k,).
    """
    from ..ops.nn import topk_valid
    emb_x = evecs_x @ C.T
    # k smallest CAD candidates per PC point
    _, topk = topk_valid(evecs_y, emb_x, x_valid, k=k)  # (V2, k)
    v2 = topk.shape[0]
    cad_idx = topk.astype(jnp.int32).reshape(-1)   # (V2*k,), PC-major order
    pc_idx = jnp.repeat(jnp.arange(v2, dtype=jnp.int32), k)
    valid = jnp.repeat(y_valid, k)

    if (jax.default_backend() == "tpu" and row_subsample == 0
            and v2 % 1024 == 0):
        # Rank-major fast path (pair index = rank * V2 + pc_point): the
        # PC-side endpoint of pair i is pc_xyz[i mod V2], so the (P, P)
        # PC distance matrix is the (V2, V2) point table tiled k x k.
        # Precomputing it halves each pruning round's VPU work (the
        # measured dominant cost of the whole filter stage on v5e —
        # docs/prof_tpu/stage_summary.json: 239 of 467 ms/batch).
        # Same math and f32 precision as the PC-major path below; only
        # the summation order differs.
        from ..ops.pallas import consistency_sum_rank_major
        hi = jax.lax.Precision.HIGH
        ca_rm = cad_xyz[topk.astype(jnp.int32).T.reshape(-1)]
        dpc = jnp.sqrt(pairwise_sqdist(pc_xyz, pc_xyz, precision=hi))
        valid_rm = jnp.tile(y_valid, k)

        def cmean(v):
            w = v.astype(jnp.float32)
            denom = jnp.maximum(jnp.sum(w), 1.0)
            return consistency_sum_rank_major(ca_rm, dpc, w, v2=v2) / denom

        for tau in taus[:-2]:
            valid_rm = valid_rm & (cmean(valid_rm) < tau * diam_cad)
        m = cmean(valid_rm)
        keep_tight = valid_rm & (m < taus[-2] * diam_cad)
        keep_loose = valid_rm & (m < taus[-1] * diam_cad)
        valid_rm = jnp.where(jnp.any(keep_tight), keep_tight, keep_loose)
        return (jnp.stack([cad_idx, pc_idx]),
                valid_rm.reshape(k, v2).T.reshape(-1))

    ca = cad_xyz[cad_idx]                          # (P, 3)
    cb = pc_xyz[pc_idx]

    def prune(valid, tau):
        m = _consistency_mean(ca, cb, valid, row_subsample)
        return valid & (m < tau * diam_cad)

    for tau in taus[:-2]:
        valid = prune(valid, tau)
    # final stage with fallback threshold (reference
    # spacial_filtering.py:68-73)
    m = _consistency_mean(ca, cb, valid, row_subsample)
    keep_tight = valid & (m < taus[-2] * diam_cad)
    keep_loose = valid & (m < taus[-1] * diam_cad)
    valid = jnp.where(jnp.any(keep_tight), keep_tight, keep_loose)
    return jnp.stack([cad_idx, pc_idx]), valid
