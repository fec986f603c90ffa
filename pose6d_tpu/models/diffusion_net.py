"""DiffusionNet feature extractor (mask-aware, dense-spectral, flax).

Architecture mirrors the effective surface of the reference's
`DPFM.dpfm.diffusion_net.layers.DiffusionNet` as instantiated at
reference models/dpfm.py:22-30 and confirmed against weights.pt
(SURVEY §2.3): first_lin(C_in->width) -> N x [LearnedTimeDiffusion +
MiniMLP + skip] -> last_lin(width->C_out), spectral diffusion method.

The reference exposes `with_gradient_features` / `with_gradient_rotations`
(models/dpfm.py:28-29; it runs with features off). Both variants exist
here. The reference's gradX/gradY are sparse (V, V) torch matrices; a
dense (V, V) per-sample matmul would waste HBM on TPU, so gradients are
carried in fixed-width gather form instead — (idx (V, Kn), cx/cy (V, Kn))
per shape, the padded rows of the sparse operators — and each
directional derivative is one vectorized gather + weighted sum on the
VPU. Spectral heat diffusion is three dense matmuls (MXU-friendly); no
sparse Laplacian is needed on device. Padded vertices are handled by
zero mass + zero eigenvector rows; activations at padded rows are
re-zeroed after each block so garbage cannot leak through the MLP skip
path.
"""
from __future__ import annotations

from typing import Optional, Sequence

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


def apply_gather_gradient(coef, idx, x):
    """One directional-derivative application: row i of the sparse
    operator holds entries coef[i, :] at columns idx[i, :]."""
    return jnp.einsum("vk,vkc->vc", coef, x[idx])


class SpatialGradientFeatures(nn.Module):
    """Tangent-gradient inner-product features (DiffusionNet, Sharp et
    al. 2022): treat (d/dX, d/dY) as a complex field z, map it through a
    learned per-channel linear A (complex when with_gradient_rotations —
    rotation-aware pairing), emit tanh(Re(conj(z) * A z))."""
    width: int
    with_gradient_rotations: bool = True

    @nn.compact
    def __call__(self, gx, gy):
        dense = lambda n: nn.Dense(self.width, use_bias=False, name=n)  # noqa: E731
        if self.with_gradient_rotations:
            wre, wim = dense("A_re"), dense("A_im")
            zr = wre(gx) - wim(gy)
            zi = wim(gx) + wre(gy)
        else:
            w = dense("A")
            zr, zi = w(gx), w(gy)
        return nn.tanh(gx * zr + gy * zi)


class DiffusionBlock(nn.Module):
    width: int
    with_gradient_features: bool = False
    with_gradient_rotations: bool = True

    @nn.compact
    def __call__(self, x, mass, evals, evecs, valid, grad=None):
        time = self.param("diffusion_time", nn.initializers.zeros,
                          (self.width,))
        x_diffuse = heat_diffusion(x, time, mass, evals, evecs)
        if self.with_gradient_features:
            idx, cx, cy = grad
            gx = apply_gather_gradient(cx, idx, x_diffuse)
            gy = apply_gather_gradient(cy, idx, x_diffuse)
            gfeat = SpatialGradientFeatures(
                self.width, self.with_gradient_rotations,
                name="gradient_features")(gx, gy)
            combined = jnp.concatenate([x, x_diffuse, gfeat], axis=-1)
        else:
            combined = jnp.concatenate([x, x_diffuse], axis=-1)
        out = MiniMLP((self.width, self.width, self.width), name="mlp")(combined)
        out = out + x  # skip
        return out * valid[:, None]


class DiffusionNet(nn.Module):
    c_in: int = 3
    c_out: int = 32
    width: int = 64
    n_blocks: int = 2
    with_gradient_features: bool = False
    with_gradient_rotations: bool = True

    @nn.compact
    def __call__(self, x, mass, evals, evecs, valid,
                 grad: Optional[tuple] = None):
        """x (V, c_in) vertex features; returns (V, c_out).

        mass (V,), evals (K,), evecs (V, K), valid (V,) bool.
        grad: (idx (V, Kn) int, cx (V, Kn), cy (V, Kn)) gather-form
        tangent-gradient operators; required iff with_gradient_features.
        A shape without meaningful gradients (the reference nulls the PC
        branch's at models/dpfm.py:51) passes zero coefficients.
        """
        if self.with_gradient_features and grad is None:
            raise ValueError("with_gradient_features=True requires grad "
                             "operators (idx, cx, cy)")
        x = nn.Dense(self.width, name="first_lin")(x)
        x = x * valid[:, None]
        for b in range(self.n_blocks):
            x = DiffusionBlock(self.width, self.with_gradient_features,
                               self.with_gradient_rotations,
                               name=f"block_{b}")(
                x, mass, evals, evecs, valid, grad)
        x = nn.Dense(self.c_out, name="last_lin")(x)
        return x * valid[:, None]
