"""Point sampling and neighbor queries: farthest point sampling, kNN.

The reference delegates FPS to DPFM's torch utility (dataset/object.py:147)
and kNN to dense torch cdist / sklearn trees. Here both are fixed-shape
JAX ops: FPS is a lax.fori_loop maintaining the running min-distance field
(O(S*N) on the VPU), kNN is a blocked top-k over the MXU-computed distance
matrix.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .geometry import pairwise_sqdist
from .masking import BIG


@functools.partial(jax.jit, static_argnames=("n_samples",))
def farthest_point_sample(points, valid, n_samples: int):
    """Deterministic farthest-point sampling on a padded point set.

    Starts from the first valid point, then greedily adds the point with
    maximal distance to the selected set. Invalid points are never chosen
    (distance forced to -inf).

    Returns:
      idx (n_samples,) int32 indices into `points`;
      sel_valid (n_samples,) bool — False where fewer valid points exist
        than requested (indices then repeat the last valid pick).
    """
    n = points.shape[0]
    big_neg = -jnp.float32(BIG)
    start = jnp.argmax(valid)  # first valid point

    def body(i, state):
        idx, min_d = state
        last = idx[i - 1]
        d = jnp.sum((points - points[last]) ** 2, axis=-1)
        min_d = jnp.minimum(min_d, d)
        scored = jnp.where(valid, min_d, big_neg)
        nxt = jnp.argmax(scored)
        return idx.at[i].set(nxt), min_d

    idx0 = jnp.zeros((n_samples,), jnp.int32).at[0].set(start.astype(jnp.int32))
    min_d0 = jnp.full((n,), jnp.float32(BIG))
    idx, _ = jax.lax.fori_loop(1, n_samples, body, (idx0, min_d0))
    n_valid = jnp.sum(valid.astype(jnp.int32))
    sel_valid = jnp.arange(n_samples) < n_valid
    return idx, sel_valid


@functools.partial(jax.jit, static_argnames=("k",))
def knn(query, query_valid, ref, ref_valid, k: int):
    """k nearest valid `ref` points for each query point.

    Returns (dists (Q, k) sqrt distances, idx (Q, k) int32). Entries for
    invalid refs/queries carry BIG distances.
    """
    d2 = pairwise_sqdist(query, ref)
    d2 = jnp.where(ref_valid[None, :], d2, BIG)
    d2 = jnp.where(query_valid[:, None], d2, BIG)
    neg, idx = jax.lax.top_k(-d2, k)
    return jnp.sqrt(jnp.maximum(-neg, 0.0)), idx
