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


def _prune_schedule(cmean, valid, taus, diam_cad):
    """The shared taus pruning loop: plain rounds for every entry but
    the last two, then the (tight, loose-fallback) final round
    (reference spacial_filtering.py:59-73). cmean(valid) -> per-pair
    mean consistency; one copy of the threshold logic for both the
    rank-major and PC-major paths."""
    for tau in taus[:-2]:
        valid = valid & (cmean(valid) < tau * diam_cad)
    m = cmean(valid)
    keep_tight = valid & (m < taus[-2] * diam_cad)
    keep_loose = valid & (m < taus[-1] * diam_cad)
    return jnp.where(jnp.any(keep_tight), keep_tight, keep_loose)


@functools.partial(jax.jit, static_argnames=("k", "row_subsample",
                                             "rank_major"))
def spatial_filtering_fmap2pointmap(C, evecs_x, evecs_y, cad_xyz, pc_xyz,
                                    x_valid, y_valid, diam_cad,
                                    k: int = 5, row_subsample: int = 0,
                                    taus=(0.3, 0.15, 0.055, 0.065),
                                    rank_major: bool | None = None):
    """Top-k spectral candidates + multi-stage distance-consistency
    pruning.

    taus: pruning schedule as diam_cad fractions — every entry but the
    last two is a plain pruning round; the final pair is the
    (tight, loose-fallback) threshold of the last round (reference
    spacial_filtering.py:59-73 hardcodes (0.3, 0.15, 0.055, 0.065)).

    rank_major: None = auto (TPU + aligned shapes); True forces the
    rank-major Pallas path (interpret mode off-TPU — lets CPU tests
    cover the whole branch, not just the kernel); False forces PC-major.

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

    on_tpu = jax.default_backend() == "tpu"
    if rank_major is None:
        rank_major = on_tpu and row_subsample == 0 and v2 % 1024 == 0
    if rank_major:
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
        # off-TPU the forced branch runs the kernel in interpret mode
        # with v2-sized blocks (the defaults assume v2 % 1024 == 0)
        kw = ({} if on_tpu else
              {"interpret": True,
               "block_i": min(512, v2), "block_j": min(1024, v2)})

        def cmean(v):
            w = v.astype(jnp.float32)
            denom = jnp.maximum(jnp.sum(w), 1.0)
            return consistency_sum_rank_major(ca_rm, dpc, w, v2=v2,
                                              **kw) / denom

        valid_rm = _prune_schedule(cmean, jnp.tile(y_valid, k), taus,
                                   diam_cad)
        return (jnp.stack([cad_idx, pc_idx]),
                valid_rm.reshape(k, v2).T.reshape(-1))

    ca = cad_xyz[cad_idx]                          # (P, 3)
    cb = pc_xyz[pc_idx]

    def cmean(v):
        return _consistency_mean(ca, cb, v, row_subsample)

    valid = _prune_schedule(cmean, valid, taus, diam_cad)
    return jnp.stack([cad_idx, pc_idx]), valid
