"""Static-shape padding / masking helpers.

XLA compiles one program per shape, so every ragged quantity in the
pipeline (CAD vertex count, partial-cloud point count, correspondence
count) is carried as a fixed-size buffer plus a boolean validity mask.
The reference pads with torch pad_sequence at collate time
(reference dataset/helpers.py:22-50); here padding is a first-class
contract enforced end to end.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Canonical static sizes for the LM-family pipeline. CAD meshes are
# decimated to <=10k faces (~5002 verts for LM); partial clouds are
# FPS-capped at 2000 points (reference dataset/object.py:145-148,172).
V_CAD = 5120   # padded CAD vertex budget (40 * 128 lanes)
V_PC = 2048    # padded partial-cloud budget (16 * 128 lanes)
K_EIG = 64     # eigenbasis size used for diffusion
N_FMAP = 30    # spectral map size (reference config/dpfm_orig.yaml: n_fmap)

BIG = 1e9  # sentinel distance for invalid entries


def pad_to(x: np.ndarray, n: int, axis: int = 0, fill=0.0) -> np.ndarray:
    """Pad `x` with `fill` along `axis` up to length `n` (truncates if longer)."""
    x = np.asarray(x)
    cur = x.shape[axis]
    if cur >= n:
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, n)
        return x[tuple(sl)]
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, n - cur)
    return np.pad(x, widths, constant_values=fill)


def length_mask(n, total: int):
    """Boolean mask of shape (total,) with the first `n` entries True."""
    return jnp.arange(total) < n


def masked_mean(x, mask, axis=None, eps: float = 1e-12):
    """Mean of `x` over entries where `mask` is True."""
    mask = mask.astype(x.dtype)
    return jnp.sum(x * mask, axis=axis) / (jnp.sum(mask, axis=axis) + eps)


def masked_var(x, mask, axis=None, eps: float = 1e-12):
    mu = masked_mean(x, mask, axis=axis, eps=eps)
    if axis is not None:
        mu_b = jnp.expand_dims(mu, axis)
    else:
        mu_b = mu
    return masked_mean((x - mu_b) ** 2, mask, axis=axis, eps=eps)


def masked_softmax(logits, mask, axis=-1):
    """Softmax over `axis`, treating mask==False entries as -inf.

    Rows with no valid entry return all zeros (not NaN).
    """
    neg = jnp.finfo(logits.dtype).min
    masked = jnp.where(mask, logits, neg)
    m = jnp.max(masked, axis=axis, keepdims=True)
    e = jnp.exp(masked - m) * mask.astype(logits.dtype)
    s = jnp.sum(e, axis=axis, keepdims=True)
    return e / jnp.maximum(s, 1e-30)


def masked_argmin(d, mask, axis=-1):
    """Argmin of `d` along `axis` restricted to mask==True entries."""
    return jnp.argmin(jnp.where(mask, d, BIG), axis=axis)
