"""Pallas TPU kernels: fused masked cdist -> argmin / top-k.

The O(V1*V2) nearest-neighbor pattern recurs across the framework
(fmap->p2p conversion, spatial-filter candidate generation, ICP
assignment, ADD-S). The XLA path materializes the (V1, V2) distance
matrix in HBM (~42 MB at production shapes) before reducing; these
kernels keep each distance tile in VMEM, fuse the |a|^2 - 2ab + |b|^2
expansion (MXU) with the running reduction (VPU), and only ever write
the (V1,) results.

Grid: 1-D over rows of `a`; the full `b` block is resident in VMEM
(2048 x C f32 fits comfortably in 16 MB). Column masking folds the
validity of `b` into a +BIG additive term.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..masking import BIG


def _argmin_kernel(a_ref, b_ref, bmask_ref, dmin_ref, idx_ref):
    a = a_ref[:]                      # (BN, C)
    b = b_ref[:]                      # (M, C)
    a2 = jnp.sum(a * a, axis=1, keepdims=True)            # (BN, 1)
    b2 = jnp.sum(b * b, axis=1, keepdims=True).T          # (1, M)
    cross = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    d2 = jnp.maximum(a2 - 2.0 * cross + b2, 0.0)
    d2 = d2 + bmask_ref[0, :].reshape(1, -1)              # +BIG on invalid
    dmin_ref[:, 0] = jnp.min(d2, axis=1)
    idx_ref[:, 0] = jnp.argmin(d2, axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def masked_argmin_cdist(a, b, b_valid, block_n: int = 512,
                        interpret: bool = False):
    """argmin_j ||a_i - b_j||^2 over valid b rows.

    a (N, C), b (M, C), b_valid (M,) bool. Returns (d2_min (N,),
    idx (N,) int32). N must be a multiple of block_n (pad a).
    """
    n, c = a.shape
    m = b.shape[0]
    assert n % block_n == 0, (n, block_n)
    bmask = jnp.where(b_valid, 0.0, BIG).astype(jnp.float32)[None, :]
    dmin, idx = pl.pallas_call(
        _argmin_kernel,
        grid=(n // block_n,),
        in_specs=[
            pl.BlockSpec((block_n, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ],
        interpret=interpret,
    )(a.astype(jnp.float32), b.astype(jnp.float32), bmask)
    return dmin[:, 0], idx[:, 0]


def _topk_kernel_factory(k: int):
    def kernel(a_ref, b_ref, bmask_ref, dk_ref, ik_ref):
        a = a_ref[:]
        b = b_ref[:]
        a2 = jnp.sum(a * a, axis=1, keepdims=True)
        b2 = jnp.sum(b * b, axis=1, keepdims=True).T
        cross = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
        d2 = jnp.maximum(a2 - 2.0 * cross + b2, 0.0)
        d2 = d2 + bmask_ref[0, :].reshape(1, -1)
        # top_k has no Mosaic lowering; take k successive masked argmins
        # (k is small and static).
        cols = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        for kk in range(k):
            dmin = jnp.min(d2, axis=1)
            imin = jnp.argmin(d2, axis=1).astype(jnp.int32)
            dk_ref[:, kk] = dmin
            ik_ref[:, kk] = imin
            d2 = jnp.where(cols == imin[:, None], jnp.float32(2 * BIG), d2)
    return kernel


@functools.partial(jax.jit, static_argnames=("k", "block_n", "interpret"))
def masked_topk_cdist(a, b, b_valid, k: int = 5, block_n: int = 512,
                      interpret: bool = False):
    """k smallest ||a_i - b_j||^2 per row over valid b rows.

    Returns (d2 (N, k), idx (N, k) int32), ascending per row.
    """
    n, c = a.shape
    m = b.shape[0]
    assert n % block_n == 0, (n, block_n)
    bmask = jnp.where(b_valid, 0.0, BIG).astype(jnp.float32)[None, :]
    dk, ik = pl.pallas_call(
        _topk_kernel_factory(k),
        grid=(n // block_n,),
        in_specs=[
            pl.BlockSpec((block_n, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_n, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, k), jnp.float32),
            jax.ShapeDtypeStruct((n, k), jnp.int32),
        ],
        interpret=interpret,
    )(a.astype(jnp.float32), b.astype(jnp.float32), bmask)
    return dk, ik
