"""Pallas TPU kernel: fused spatial-consistency sums.

The exact spatial filter (solvers/fmap2pointmap.py, reference
spacial_filtering.py:42-58) needs, per candidate pair j,

    s_j = sum_i w_i * | ||cad_i - cad_j|| - ||pc_i - pc_j|| |

over all P pairs i. The XLA path materializes two (P, P) distance
matrices in HBM (P = V2*k = 10240 at production shapes -> 2 x 420 MB
per pruning round, three rounds per solve). This kernel tiles both
distance computations and the weighted reduction over (i, j) blocks so
nothing bigger than a VMEM tile ever exists: reads are 2 x P x 3 coords
per block row, writes are the (P,) sums.

Grid (nj, ni), i innermost: the output block for column block j stays
resident in VMEM while the i-blocks accumulate into it.

Block sizes: the kernel's live temporaries (da, db, |da-db|*w and the
sqd intermediates, each (block_i, block_j) f32) land on the scoped VMEM
stack; at 1024x1024 that stack hits the 16 MB scoped limit on v5e
(observed as a compile-time "out of memory in memory space vmem ... on
stack" at production shapes). 512x1024 halves the stack with no change
in HBM traffic; the column block stays 1024 wide so output accumulation
is still lane-aligned.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _consistency_kernel(car_ref, cbr_ref, w_ref, cac_ref, cbc_ref, out_ref):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    ar = car_ref[:]                   # (BI, C) cad rows
    br = cbr_ref[:]                   # (BI, C) pc rows
    ac = cac_ref[:]                   # (BJ, C) cad cols
    bc = cbc_ref[:]                   # (BJ, C) pc cols
    w = w_ref[:]                      # (BI, 1) row weights

    def sqd(x, y):
        x2 = jnp.sum(x * x, axis=1, keepdims=True)
        y2 = jnp.sum(y * y, axis=1, keepdims=True).T
        cross = jnp.dot(x, y.T, preferred_element_type=jnp.float32)
        return jnp.maximum(x2 - 2.0 * cross + y2, 0.0)

    da = jnp.sqrt(sqd(ar, ac))
    db = jnp.sqrt(sqd(br, bc))
    out_ref[0, :] += jnp.sum(jnp.abs(da - db) * w, axis=0)


def _consistency_rm_kernel(car_ref, w_ref, cac_ref, dpc_ref, out_ref):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    ar = car_ref[:]                   # (BI, C) cad rows
    ac = cac_ref[:]                   # (BJ, C) cad cols
    w = w_ref[:]                      # (BI, 1) row weights

    a2 = jnp.sum(ar * ar, axis=1, keepdims=True)
    c2 = jnp.sum(ac * ac, axis=1, keepdims=True).T
    cross = jnp.dot(ar, ac.T, preferred_element_type=jnp.float32)
    da = jnp.sqrt(jnp.maximum(a2 - 2.0 * cross + c2, 0.0))
    out_ref[0, :] += jnp.sum(jnp.abs(da - dpc_ref[:]) * w, axis=0)


@functools.partial(jax.jit,
                   static_argnames=("v2", "block_i", "block_j", "interpret"))
def consistency_sum_rank_major(coords_cad, dpc, w, v2: int,
                               block_i: int = 512, block_j: int = 1024,
                               interpret: bool = False):
    """Rank-major variant: sum_i w_i * |d_cad(i,j) - dpc(i%v2, j%v2)|.

    The spatial filter's candidate pairs are (cad_idx, pc_idx) with
    pc_idx = pair_index mod v2 under *rank-major* ordering (pair index
    = rank * v2 + pc_point). The PC-side distance between pairs i and j
    then depends only on (i mod v2, j mod v2): the full (P, P) PC
    distance matrix is the (v2, v2) point-distance table tiled k x k.
    Precomputing that table (4 M entries vs 105 M at production shapes)
    removes one of the two sqd+sqrt evaluations per block — the
    measured dominant VPU cost of the exact filter — and the kernel
    reads the tile via a modular BlockSpec index map instead of
    recomputing it.

    coords_cad (P, C) rank-major pair endpoints; dpc (v2, v2) f32
    point-distance table; w (P,) f32 row weights. Requires
    block_i | v2 and block_j | v2 (so each block spans one rank group).
    Returns (P,) f32 sums.
    """
    P, c = coords_cad.shape
    assert P % block_i == 0 and P % block_j == 0, (P, block_i, block_j)
    assert v2 % block_i == 0 and v2 % block_j == 0, (v2, block_i, block_j)
    pad_c = (-c) % 8
    if pad_c:
        coords_cad = jnp.pad(coords_cad, ((0, 0), (0, pad_c)))
        c += pad_c
    nbi, nbj = v2 // block_i, v2 // block_j
    out = pl.pallas_call(
        _consistency_rm_kernel,
        grid=(P // block_j, P // block_i),
        in_specs=[
            pl.BlockSpec((block_i, c), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_i, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_j, c), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_i, block_j),
                         lambda j, i: (i % nbi, j % nbj),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_j), lambda j, i: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, P), jnp.float32),
        interpret=interpret,
    )(coords_cad.astype(jnp.float32),
      w.astype(jnp.float32)[:, None],
      coords_cad.astype(jnp.float32),
      dpc.astype(jnp.float32))
    return out[0]


@functools.partial(jax.jit,
                   static_argnames=("block_i", "block_j", "interpret"))
def masked_consistency_sum(coords_cad, coords_pc, w,
                           block_i: int = 512, block_j: int = 1024,
                           interpret: bool = False):
    """sum_i w_i * |d_cad(i,j) - d_pc(i,j)| for every pair j.

    coords_cad/coords_pc (P, C), w (P,) float32 row weights (0 for
    invalid rows). Returns (P,) float32. P must be a multiple of the
    block sizes (the caller's pair lists are padded to V2*k).
    """
    P, c = coords_cad.shape
    assert P % block_i == 0 and P % block_j == 0, (P, block_i, block_j)
    pad_c = (-c) % 8
    if pad_c:  # zero feature columns change no distance
        coords_cad = jnp.pad(coords_cad, ((0, 0), (0, pad_c)))
        coords_pc = jnp.pad(coords_pc, ((0, 0), (0, pad_c)))
        c += pad_c
    out = pl.pallas_call(
        _consistency_kernel,
        grid=(P // block_j, P // block_i),
        in_specs=[
            pl.BlockSpec((block_i, c), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_i, c), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_i, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_j, c), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_j, c), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_j), lambda j, i: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, P), jnp.float32),
        interpret=interpret,
    )(coords_cad.astype(jnp.float32), coords_pc.astype(jnp.float32),
      w.astype(jnp.float32)[:, None],
      coords_cad.astype(jnp.float32), coords_pc.astype(jnp.float32))
    return out[0]
