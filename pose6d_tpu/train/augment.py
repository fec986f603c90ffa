"""Train-time rigid augmentation of the partial cloud.

The LBO eigenbasis is intrinsic — invariant under rigid motion of the
point set — so rotating/translating `pc.xyz` keeps every cached spectral
quantity (mass, evals, evecs) and every ground-truth supervision signal
(correspondence pairs P, overlap masks, the lstsq C_gt built from evecs)
exactly valid, while the *input features* (normalized xyz,
models/dpfm.py norm_shift/scale) see a new camera-frame pose.

This targets the measured failure mode of the unseen-category protocol:
DiffusionNet features overfit absolute camera-frame coordinates (the
ported reference weights reproduce visibility but their features are
not pose-invariant out of distribution — README "weights.pt port" row).
The reference trains with no augmentation (scripts/train.py:78-124).

Rotation is about the cloud's valid-point centroid (the cloud sits
~90-120 cm down the optical axis; rotating about the origin would fling
it outside the input-normalization range), plus an optional uniform
translation jitter. Padded rows stay exactly zero.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _random_rotation(key, max_angle: float):
    """Uniform-axis random rotation with angle ~ U[0, max_angle]."""
    k1, k2 = jax.random.split(key)
    axis = jax.random.normal(k1, (3,))
    axis = axis / jnp.maximum(jnp.linalg.norm(axis), 1e-12)
    angle = jax.random.uniform(k2, (), minval=0.0, maxval=max_angle)
    x, y, z = axis
    K = jnp.array([[0.0, -z, y], [z, 0.0, -x], [-y, x, 0.0]])
    return (jnp.eye(3) + jnp.sin(angle) * K
            + (1.0 - jnp.cos(angle)) * (K @ K))


def augment_pc_batch(key, batch, max_angle: float = 0.0,
                     trans_jitter: float = 0.0):
    """Return `batch` with pc.xyz rigidly perturbed per sample.

    max_angle (radians): max rotation about the valid-point centroid.
    trans_jitter (pipeline units, cm): per-axis uniform translation.
    Both 0 -> returns batch unchanged.
    """
    if max_angle <= 0.0 and trans_jitter <= 0.0:
        return batch
    xyz = batch["pc"]["xyz"]
    valid = batch["pc"]["valid"]
    B = xyz.shape[0]
    keys = jax.random.split(key, B)

    def one(k, x, v):
        kr, kt = jax.random.split(k)
        vf = v.astype(x.dtype)[:, None]
        c = jnp.sum(x * vf, axis=0) / jnp.maximum(jnp.sum(vf), 1.0)
        R = (_random_rotation(kr, max_angle) if max_angle > 0.0
             else jnp.eye(3, dtype=x.dtype))
        d = (jax.random.uniform(kt, (3,), minval=-trans_jitter,
                                maxval=trans_jitter)
             if trans_jitter > 0.0 else jnp.zeros(3, x.dtype))
        moved = (x - c) @ R.T + c + d
        return jnp.where(vf > 0, moved, 0.0)

    new_xyz = jax.vmap(one)(keys, xyz, valid)
    new_pc = dict(batch["pc"])
    new_pc["xyz"] = new_xyz
    out = dict(batch)
    out["pc"] = new_pc
    return out
