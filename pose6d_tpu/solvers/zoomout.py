"""ZoomOut spectral upsampling of a predicted functional map (eval-time).

Melzi et al., "ZoomOut: Spectral Upsampling for Efficient Shape
Correspondence" (SIGGRAPH Asia 2019): alternate between (a) converting
the current functional map to a pointwise map and (b) refitting the
functional map on those matches in a *larger* spectral basis. Each
round adds high-frequency eigenvectors the network never predicted
(DPFM stops at n_fmap=30; the operator cache holds k_eig=64), so the
pointwise map sharpens without any retraining — a pure eval-time
refinement knob (eval.zoomout_k), off by default for reference parity
(the reference has no equivalent; its maps stay 30x30,
fmap2pointmap_solvers/naive.py).

Partiality note: in this protocol the observed cloud is a subset of the
CAD surface, so every valid PC point has a CAD correspondent and the
PC-side least-squares refit is well-posed; partiality shows up only as
a slanted-diagonal C, which the refit represents fine.

TPU mapping: one unrolled python loop over growth steps — every slice
size is static, so the whole refinement stays inside a single jitted
program; the nearest-neighbor step runs at the full padded width where
zero-padded map rows add a per-row constant that cannot change the
argmin.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.nn import nearest_valid


def zoomout_refine(C0, evecs_x, evecs_y, x_valid, y_valid,
                   step: int = 4, ridge: float = 1e-6,
                   cad_xyz=None, pc_xyz=None, diam=None,
                   gate_tau: float = 0.0):
    """Grow C0 (k0, k0) to (k1, k1), k1 = evecs width, by ZoomOut rounds.

    Args:
      C0: predicted functional map, CAD-spectral -> PC-spectral.
      evecs_x (V1, k1): CAD eigenvectors (full cached width).
      evecs_y (V2, k1): PC eigenvectors.
      x_valid/y_valid: padding masks.
      step: spectral growth per round.
      ridge: Tikhonov term for the masked normal equations.
      cad_xyz/pc_xyz/diam + gate_tau > 0: consistency-gated refit — each
        round keeps only matches whose pairwise-distance consistency
        (the spatial filter's criterion, fmap2pointmap._consistency_mean)
        beats gate_tau * diam, so outlier matches at low inlier ratios
        cannot steer the upsampled map.

    Returns C (k1, k1). Shapes are static per unrolled round, so this
    traces into one program.
    """
    f32 = jnp.float32
    k0 = C0.shape[0]
    k1 = evecs_x.shape[1]
    if k1 < k0:
        raise ValueError(f"evecs width {k1} < map size {k0}")
    C = jnp.zeros((k1, k1), f32).at[:k0, :k0].set(C0.astype(f32))
    wy0 = y_valid.astype(f32)[:, None]
    ex = evecs_x.astype(f32)
    ey = evecs_y.astype(f32)
    gated = gate_tau > 0.0 and cad_xyz is not None

    ks = list(range(k0 + step, k1, step)) + [k1]
    for kn in ks:
        # (a) pointwise map from the current C: zero columns >= k_cur on
        # the embedded side only add a j-constant to each distance row,
        # so the argmin equals the k_cur-truncated one
        emb_x = ex @ C.T                     # (V1, k1)
        _, p2p = nearest_valid(ey, emb_x, x_valid)
        wy = wy0
        if gated:
            from .fmap2pointmap import _consistency_mean
            m = _consistency_mean(cad_xyz[p2p], pc_xyz, y_valid)
            keep = (m < gate_tau * diam)[:, None].astype(f32) * wy0
            # fall back to ungated rows if the gate starved the refit
            wy = jnp.where(jnp.sum(keep) >= kn, keep, wy0)
        # (b) refit at width kn on the matches, PC-validity weighted
        A = ex[p2p, :kn]                     # (V2, kn)
        B = ey[:, :kn]
        Aw = A * wy
        M = A.T @ Aw + ridge * jnp.eye(kn, dtype=f32)
        N = Aw.T @ B
        Ck = jnp.linalg.solve(M, N).T        # (kn, kn), maps CAD -> PC
        C = jnp.zeros((k1, k1), f32).at[:kn, :kn].set(Ck)
    return C
