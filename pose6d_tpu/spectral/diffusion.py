"""Device-side spectral ops: basis projection and learned heat diffusion.

The dense spectral form of DiffusionNet's LearnedTimeDiffusion
(reference SURVEY §2.3: x_diffuse = Phi diag(e^{-lambda t}) Phi^T M x):
three small matmuls that ride the MXU, no sparse ops on device.
"""
from __future__ import annotations

import jax.numpy as jnp


def to_basis(x, evecs, mass):
    """Project vertex functions into the spectral basis: Phi^T (M x).

    x (..., V, C), evecs (..., V, K), mass (..., V) -> (..., K, C).
    Padded vertices carry zero mass, so they contribute nothing.
    """
    weighted = x * mass[..., None]
    return jnp.einsum("...vk,...vc->...kc", evecs, weighted)


def from_basis(x_spec, evecs):
    """Lift spectral coefficients back to vertices: Phi x_spec."""
    return jnp.einsum("...vk,...kc->...vc", evecs, x_spec)


def heat_diffusion(x, time, mass, evals, evecs):
    """Per-channel learned-time heat diffusion in the spectral basis.

    x (..., V, C); time (C,) learned diffusion times (clamped >= 1e-8,
    matching DiffusionNet); evals (..., K); evecs (..., V, K);
    mass (..., V).
    """
    time = jnp.clip(time, 1e-8, None)
    x_spec = to_basis(x, evecs, mass)                      # (..., K, C)
    coefs = jnp.exp(-evals[..., None] * time)              # (..., K, C)
    return from_basis(x_spec * coefs, evecs)
