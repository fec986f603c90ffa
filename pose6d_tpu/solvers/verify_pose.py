"""Render-and-compare pose verification (on device).

Geometric distances cannot rank near-symmetric flip hypotheses (the
surfaces coincide); the depth image can: a flipped pose puts model
surface at wrong depths wherever the geometry actually differs (spouts,
handles, concavities) and spills model pixels outside the observed
instance mask.

score(R, t): splat the posed CAD vertices into a coarse z-buffer
(scatter-min), then combine
  (a) mean |rendered_z - observed_z| over pixels where both exist, and
  (b) the fraction of rendered pixels falling outside the instance mask
    (weighted by diam so both terms share units).
Lower is better. Fully jittable; used by solvers.multistart to rank
flip hypotheses.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BIGZ = 1e9


@functools.partial(jax.jit, static_argnames=("h", "w", "stride"))
def splat_depth(cad_xyz, cad_valid, R, t, K, h: int, w: int,
                stride: int = 4):
    """Posed CAD -> coarse z-buffer (h//stride, w//stride), cm units."""
    cam = cad_xyz @ R.T + t
    z = cam[:, 2]
    u = (K[0, 0] * cam[:, 0] / jnp.maximum(z, 1e-6) + K[0, 2]) / stride
    v = (K[1, 1] * cam[:, 1] / jnp.maximum(z, 1e-6) + K[1, 2]) / stride
    hh, ww = h // stride, w // stride
    ui = jnp.clip(u.astype(jnp.int32), 0, ww - 1)
    vi = jnp.clip(v.astype(jnp.int32), 0, hh - 1)
    ok = cad_valid & (z > 1e-3) & (u >= 0) & (u < ww) & (v >= 0) & (v < hh)
    flat = jnp.where(ok, vi * ww + ui, hh * ww)  # invalid -> overflow bin
    zbuf = jnp.full((hh * ww + 1,), BIGZ)
    zbuf = zbuf.at[flat].min(jnp.where(ok, z, BIGZ))
    return zbuf[:-1].reshape(hh, ww)


@functools.partial(jax.jit, static_argnames=("stride",))
def depth_consistency_score(cad_xyz, cad_valid, R, t, K, observed_z,
                            mask, diam, stride: int = 4):
    """Lower-is-better pose score against the observed depth image.

    observed_z (H, W): observed depth in the SAME units as cad/t (cm),
    0 where invalid; mask (H, W) bool instance mask.
    """
    h, w = observed_z.shape
    rendered = splat_depth(cad_xyz, cad_valid, R, t, K, h, w, stride)
    hh, ww = rendered.shape
    obs = observed_z[:hh * stride, :ww * stride]
    obs = obs.reshape(hh, stride, ww, stride)
    msk = mask[:hh * stride, :ww * stride].reshape(hh, stride, ww, stride)
    # coarse observed depth: min over the cell (front surface), only
    # masked pixels with valid depth (real sensors leave 0-holes inside
    # the instance mask; those carry no evidence)
    obs_cell = jnp.min(jnp.where(msk & (obs > 0), obs, BIGZ), axis=(1, 3))
    has_obs = obs_cell < BIGZ * 0.5
    has_ren = rendered < BIGZ * 0.5
    both = has_obs & has_ren
    n_both = jnp.maximum(jnp.sum(both), 1.0)
    depth_err = jnp.sum(jnp.where(both, jnp.abs(rendered - obs_cell), 0.0)
                        ) / n_both
    n_ren = jnp.maximum(jnp.sum(has_ren), 1.0)
    spill = jnp.sum(has_ren & ~has_obs) / n_ren
    # also penalize unexplained observed pixels (model too small / offset)
    n_obs = jnp.maximum(jnp.sum(has_obs), 1.0)
    uncovered = jnp.sum(has_obs & ~has_ren) / n_obs
    return depth_err + 0.5 * diam * spill + 0.5 * diam * uncovered
