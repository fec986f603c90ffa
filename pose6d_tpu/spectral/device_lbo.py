"""Fully on-device spectral operators for point clouds.

The reference's pipeline (and our cached mode) computes point-cloud LBO
eigenbases on host with a sparse eigensolver at cache-build time
(SURVEY §7 hard part 1). This module is the TPU-native online
alternative: a density-normalized heat-kernel graph Laplacian
(Coifman–Lafon, alpha=1 — converges to Laplace–Beltrami on sampled
manifolds) built from device kNN, plus a LOBPCG eigensolver on the
dense shifted operator. Everything is jittable: depth frame -> spectral
basis -> model -> pose with zero host round trips.

Dense (V, V) operators at V=2048 are 16 MB — trivially VMEM/HBM-sized;
the MXU eats the LOBPCG block matmuls.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.geometry import pairwise_sqdist
from ..ops.masking import BIG


@functools.partial(jax.jit, static_argnames=("k",))
def graph_laplacian(points, valid, k: int = 16):
    """Density-normalized heat-kernel graph Laplacian + lumped mass.

    Returns (L (V, V) dense PSD, mass (V,)); invalid rows/cols are zero
    with unit mass (decoupled, contribute nothing to the spectrum used).
    """
    v = points.shape[0]
    d2 = pairwise_sqdist(points, points,
                         precision=jax.lax.Precision.HIGH)
    ok = valid[:, None] & valid[None, :]
    d2m = jnp.where(ok, d2, BIG)
    d2m = jnp.where(jnp.eye(v, dtype=bool), BIG, d2m)
    knn_d2, _ = jax.lax.top_k(-d2m, k)
    knn_d2 = -knn_d2
    # bandwidth: mean kNN distance^2 (robust local scale)
    finite = knn_d2 < BIG * 0.5
    sigma2 = jnp.sum(jnp.where(finite, knn_d2, 0.0)) / jnp.maximum(
        jnp.sum(finite), 1.0)
    w = jnp.exp(-d2 / jnp.maximum(sigma2, 1e-12))
    w = jnp.where(ok & ~jnp.eye(v, dtype=bool), w, 0.0)
    # keep only mutual-neighborhood weights (sparsify): zero beyond the
    # kNN radius per row
    thresh = knn_d2[:, -1][:, None]
    keep = (d2 <= jnp.maximum(thresh, thresh.T)) & ok
    w = jnp.where(keep, w, 0.0)
    # Coifman–Lafon alpha=1 density normalization -> Laplace–Beltrami
    q = jnp.maximum(jnp.sum(w, axis=1), 1e-12)
    w = w / (q[:, None] * q[None, :])
    d = jnp.sum(w, axis=1)
    # generalized pair (L, M) = ((D' - W') * 4/sigma2, D'): the
    # random-walk generator rescaled into Laplace–Beltrami units
    # (lambda_LBO ~ lambda_rw * 4/sigma^2). Padded rows carry zero mass —
    # the model's padding contract.
    L = (jnp.diag(d) - w) * (4.0 / jnp.maximum(sigma2, 1e-12))
    mass = jnp.where(valid, d, 0.0)
    L = jnp.where(ok, L, 0.0)
    return L, mass


@functools.partial(jax.jit, static_argnames=("k_eig", "iters"))
def lobpcg_smallest(L, mass, valid, k_eig: int = 64, iters: int = 80,
                    key=None):
    """Smallest k_eig generalized eigenpairs of L phi = lambda M phi,
    fully on device.

    Whitens with M^{-1/2}, shifts (sigma*I - A) so LOBPCG's largest-k
    solves our smallest-k, un-whitens. Invalid rows are decoupled and
    pushed above the shift so they never enter the basis.
    """
    v = L.shape[0]
    f32 = jnp.float32
    m_isqrt = jnp.where(valid, 1.0 / jnp.sqrt(jnp.maximum(mass, 1e-12)),
                        0.0).astype(f32)
    A = (m_isqrt[:, None] * L * m_isqrt[None, :]).astype(f32)
    A = 0.5 * (A + A.T)
    # Gershgorin upper bound on the whitened spectrum
    sigma = jnp.max(jnp.sum(jnp.abs(A), axis=1)) + 1.0
    # decouple invalid rows at eigenvalue ~2*sigma of A so that after the
    # shift they sit at -sigma, far below any valid mode
    diag_fix = jnp.where(valid, 0.0, 2.0 * sigma)
    A = A + jnp.diag(diag_fix)
    B = sigma * jnp.eye(v, dtype=f32) - A

    if key is None:
        key = jax.random.PRNGKey(0)
    X0 = jax.random.normal(key, (v, k_eig), f32)
    X0 = jnp.where(valid[:, None], X0, 0.0)
    from jax.experimental.sparse.linalg import lobpcg_standard
    theta, U, _ = lobpcg_standard(B, X0, m=iters)
    evals = sigma - theta                      # smallest of A, ascending?
    order = jnp.argsort(evals)
    evals = jnp.clip(evals[order], 0.0, None)
    U = U[:, order]
    evecs = m_isqrt[:, None] * U               # un-whiten: M-orthonormal
    evecs = jnp.where(valid[:, None], evecs, 0.0)
    return evals, evecs


@functools.partial(jax.jit, static_argnames=("k_eig", "k_nn", "iters"))
def device_pc_operators(points, valid, k_eig: int = 64, k_nn: int = 16,
                        iters: int = 80):
    """points (V, 3) padded + valid -> (mass, evals, evecs) on device."""
    L, mass = graph_laplacian(points, valid, k=k_nn)
    evals, evecs = lobpcg_smallest(L, mass, valid, k_eig=k_eig,
                                   iters=iters)
    return mass, evals, evecs
