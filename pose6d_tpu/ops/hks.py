"""Heat-kernel-signature point descriptors from cached eigenpairs.

HKS(v, t) = sum_k exp(-lambda_k t) phi_k(v)^2 — the diagonal of the heat
kernel, an *intrinsic* descriptor: exactly invariant to rigid motion of
the point set (it never sees coordinates, only the LBO spectrum already
cached for every shape). Offered as a model input
(`DPFMConfig.input_features`) because the measured unseen-protocol
failure mode is the xyz-input encoder tying features to camera-frame
pose (docs/DESIGN.md oracle-bound note); the reference trains on raw
xyz only (models/dpfm.py:53).

Time samples are log-spaced over [4 ln10 / lambda_max, 4 ln10 / lambda_2]
per shape (the autoscaled range of Sun et al. / DiffusionNet's
compute_hks_autoscale), and each time channel is normalized to
mass-weighted mean 1 over valid vertices so CAD (full) and PC (partial)
descriptors live on a comparable scale.
"""
from __future__ import annotations

import jax.numpy as jnp

_LN10 = 2.302585092994046


def heat_kernel_signature(evals, evecs, mass, valid, n_t: int = 16):
    """Scaled HKS.

    evals (K,) ascending; evecs (V, K) zero on padded rows; mass (V,);
    valid (V,) bool. Returns (V, n_t) float, zero on padded rows.
    """
    lam = jnp.clip(evals, 0.0, None)
    l_lo = jnp.maximum(lam[1], 1e-6)          # skip the ~0 constant mode
    l_hi = jnp.maximum(lam[-1], l_lo * 1.01)
    t = jnp.exp(jnp.linspace(jnp.log(4.0 * _LN10 / l_hi),
                             jnp.log(4.0 * _LN10 / l_lo), n_t))
    e = jnp.exp(-lam[None, :] * t[:, None])   # (T, K)
    h = (evecs * evecs) @ e.T                 # (V, T)
    w = (mass * valid).astype(h.dtype)
    mean = ((w[:, None] * h).sum(0)
            / jnp.maximum(w.sum(), 1e-12))    # (T,)
    h = h / jnp.maximum(mean, 1e-12)
    return jnp.where(valid[:, None], h, 0.0)


def wave_kernel_signature(evals, evecs, mass, valid, n_e: int = 16,
                          sigma_scale: float = 7.0):
    """Scaled WKS (Aubry et al.): band-pass sibling of the HKS.

    WKS(v, e) = sum_k exp(-(e - log lambda_k)^2 / 2 sigma^2) phi_k(v)^2
    with n_e energies uniform in log-eigenvalue range and
    sigma = sigma_scale * (e_max - e_min) / n_e, clamped to at most
    (e_max - e_min) / 5 so the [e_min + 2 sigma, e_max - 2 sigma]
    window stays non-empty and ascending for small n_e (the Aubry
    formulation assumes n_e ~ 100; at n_e = 16 the unclamped window
    inverts and every channel collapses onto the mid-band). More
    discriminative at high frequencies than the low-pass HKS; same
    intrinsic invariance. Returns (V, n_e), zero on padded rows, each
    channel normalized to mass-weighted mean 1 over valid vertices.
    """
    lam = jnp.clip(evals, 1e-6, None)
    log_l = jnp.log(lam)
    e_min, e_max = log_l[1], log_l[-1]
    delta = e_max - e_min
    sigma = jnp.clip(sigma_scale * delta / n_e, 1e-3, delta / 5.0)
    e = jnp.linspace(e_min + 2.0 * sigma, e_max - 2.0 * sigma, n_e)
    g = jnp.exp(-0.5 * ((e[:, None] - log_l[None, :]) / sigma) ** 2)
    g = g / jnp.maximum(g.sum(-1, keepdims=True), 1e-12)   # (E, K)
    h = (evecs * evecs) @ g.T                               # (V, E)
    w = (mass * valid).astype(h.dtype)
    mean = (w[:, None] * h).sum(0) / jnp.maximum(w.sum(), 1e-12)
    h = h / jnp.maximum(mean, 1e-12)
    return jnp.where(valid[:, None], h, 0.0)
