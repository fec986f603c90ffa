"""Masked cross-attention via the Pallas TPU flash-attention kernel.

The refiner's V1 x V2 attention materializes an (H, N, M) score tensor
(~84 MB at production shapes) through the XLA path. This wrapper runs
JAX's production flash-attention Pallas kernel
(jax.experimental.pallas.ops.tpu.flash_attention) instead: online
softmax over K/V tiles in VMEM, nothing quadratic written to HBM, with
the library's fused backward pass for training.

Adaptations for this workload:
* head_dim is 16 (d_model 32 / 2 heads) — zero-padded to the kernel's
  128 minimum. Zero columns change neither Q K^T nor the V projection
  (outputs are sliced back), and MXU cycles are not the bottleneck here;
  HBM traffic is.
* key/value validity masking via segment ids: valid tokens share
  segment 1, padded kv tokens get segment 0 so every valid query
  ignores them.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

HEAD_DIM = 128  # kernel minimum lane width


@functools.partial(jax.jit, static_argnames=("num_heads", "sm_scale"))
def flash_cross_attention(q, k, v, q_valid, kv_valid, num_heads: int,
                          sm_scale: float):
    """q (N, dim, H), k/v (M, dim, H) in the refiner's (dim, heads)
    split; returns (N, dim, H).

    N and M must be multiples of the kernel block sizes (512 here —
    production shapes 5120/2048 qualify).
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention)
    n, dim, h = q.shape
    m = k.shape[0]

    def to_bhsd(x):
        # (S, dim, H) -> (1, H, S, dim) zero-padded to HEAD_DIM
        x = jnp.transpose(x, (2, 0, 1))[None]
        return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, HEAD_DIM - dim)))

    qb, kb, vb = to_bhsd(q), to_bhsd(k), to_bhsd(v)
    # kv masking folded into a spare padding channel: the kernel's
    # segment_ids argument is non-differentiable (cannot be traced), so
    # instead q gets 1 in channel `dim` and invalid keys get -BIG there —
    # their scores become -inf before the online softmax, exactly a mask.
    qb = qb.at[..., dim].set(1.0)
    kb = kb.at[..., dim].set(
        jnp.where(kv_valid, 0.0, -1e9 / sm_scale)[None, None, :])
    bs = BlockSizes(block_q=min(512, n), block_k_major=min(512, m),
                    block_k=min(512, m), block_b=1,
                    block_q_major_dkv=min(512, n),
                    block_k_major_dkv=min(512, m),
                    block_k_dkv=min(512, m), block_q_dkv=min(512, n),
                    block_k_major_dq=min(512, m), block_k_dq=min(512, m),
                    block_q_dq=min(512, n))
    out = flash_attention(qb, kb, vb, causal=False, sm_scale=sm_scale,
                          block_sizes=bs)
    out = out[0, :, :, :dim]                  # (H, N, dim)
    return jnp.transpose(out, (1, 2, 0))      # (N, dim, H)
