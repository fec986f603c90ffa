"""DiffusionNet feature extractor (mask-aware, dense-spectral, flax).

Architecture mirrors the effective surface of the reference's
`DPFM.dpfm.diffusion_net.layers.DiffusionNet` as instantiated at
reference models/dpfm.py:22-30 and confirmed against weights.pt
(SURVEY §2.3): first_lin(C_in->width) -> N x [LearnedTimeDiffusion +
MiniMLP(2*width -> width -> width) + skip] -> last_lin(width->C_out),
with_gradient_features=False, spectral diffusion method.

The spectral heat diffusion is three dense matmuls (MXU-friendly); no
sparse Laplacian is needed on device. Padded vertices are handled by
zero mass + zero eigenvector rows; activations at padded rows are
re-zeroed after each block so garbage cannot leak through the MLP skip
path.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..spectral.diffusion import heat_diffusion


class MiniMLP(nn.Module):
    """Linear stack with ReLU between layers (none after the last)."""
    dims: Sequence[int]  # output dims, e.g. (64, 64, 64)

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dims):
            x = nn.Dense(d, name=f"layer_{i:03d}")(x)
            if i + 1 < len(self.dims):
                x = nn.relu(x)
        return x


class DiffusionBlock(nn.Module):
    width: int

    @nn.compact
    def __call__(self, x, mass, evals, evecs, valid):
        time = self.param("diffusion_time", nn.initializers.zeros,
                          (self.width,))
        x_diffuse = heat_diffusion(x, time, mass, evals, evecs)
        combined = jnp.concatenate([x, x_diffuse], axis=-1)
        out = MiniMLP((self.width, self.width, self.width), name="mlp")(combined)
        out = out + x  # skip
        return out * valid[:, None]


class DiffusionNet(nn.Module):
    c_in: int = 3
    c_out: int = 32
    width: int = 64
    n_blocks: int = 2

    @nn.compact
    def __call__(self, x, mass, evals, evecs, valid):
        """x (V, c_in) vertex features; returns (V, c_out).

        mass (V,), evals (K,), evecs (V, K), valid (V,) bool.
        """
        x = nn.Dense(self.width, name="first_lin")(x)
        x = x * valid[:, None]
        for b in range(self.n_blocks):
            x = DiffusionBlock(self.width, name=f"block_{b}")(
                x, mass, evals, evecs, valid)
        x = nn.Dense(self.c_out, name="last_lin")(x)
        return x * valid[:, None]
