"""Regularized functional-map solver (batched, no per-row Python loop).

The reference solves one (30,30) Tikhonov-regularized system per spectral
row inside a Python loop with torch.inverse (reference
modeling/dpfm.py:188-193). Here all n_fmap rows are assembled into one
stacked (n_fmap, n_fmap, n_fmap) system and solved with a single batched
jnp.linalg.solve — one LU kernel launch, vmappable over the frame batch.
Solved in f32 regardless of model activativation dtype (SURVEY §7 hard
part 4).
"""
from __future__ import annotations

import jax.numpy as jnp


def resolvent_mask(evals_x, evals_y, gamma: float = 0.5):
    """Spectral resolvent mask D (n_fmap, n_fmap).

    Rows indexed by evals_y (target basis), cols by evals_x, following
    DPFM's get_mask (consumed at reference modeling/dpfm.py:177-182):
    D_ij = |re(1/(mu_i^g i + 1)) - re(...)|^2 + |im(...)|^2 with
    g-powered, max-normalized eigenvalues.
    """
    scale = jnp.maximum(jnp.max(evals_x), jnp.max(evals_y))
    ex = (evals_x / scale) ** gamma  # cols
    ey = (evals_y / scale) ** gamma  # rows
    gx = ex[None, :]
    gy = ey[:, None]
    m_re = gy / (gy ** 2 + 1) - gx / (gx ** 2 + 1)
    m_im = 1 / (gy ** 2 + 1) - 1 / (gx ** 2 + 1)
    return m_re ** 2 + m_im ** 2


def solve_fmap(feat_x, feat_y, evals_x, evals_y, evecs_trans_x,
               evecs_trans_y, lambda_: float = 100.0, gamma: float = 0.5):
    """Regularized least-squares functional map C12 (x -> y).

    feat_x (V1, C), feat_y (V2, C); evals_* (n_fmap,);
    evecs_trans_* (n_fmap, V*) = Phi[:, :n_fmap]^T diag(mass).

    Row i of C solves (A A^T + lambda diag(D_i)) c_i = (B A^T)_i with
    A = Phi_x^T M_x F, B = Phi_y^T M_y G.
    """
    f32 = jnp.float32
    A = (evecs_trans_x @ feat_x).astype(f32)      # (K, C)
    B = (evecs_trans_y @ feat_y).astype(f32)      # (K, C)
    D = resolvent_mask(evals_x.astype(f32), evals_y.astype(f32), gamma)
    AAt = A @ A.T                                  # (K, K)
    BAt = B @ A.T                                  # (K, K)
    k = A.shape[0]
    # Stacked systems: M[i] = AAt + lambda * diag(D[i]).
    M = AAt[None, :, :] + lambda_ * D[:, :, None] * jnp.eye(k, dtype=f32)[None]
    C = jnp.linalg.solve(M, BAt[:, :, None])[:, :, 0]  # row i
    return C
