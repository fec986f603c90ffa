"""Pallas kernel tests — run in interpret mode on CPU; the same code
compiles natively on TPU (exercised by bench.py)."""
import numpy as np
import jax.numpy as jnp

from pose6d_tpu.ops.pallas import masked_argmin_cdist, masked_topk_cdist


def test_argmin_matches_dense():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(256, 30)).astype(np.float32)
    b = rng.normal(size=(128, 30)).astype(np.float32)
    valid = np.ones(128, bool)
    valid[100:] = False
    d2, idx = masked_argmin_cdist(jnp.asarray(a), jnp.asarray(b),
                                  jnp.asarray(valid), block_n=128,
                                  interpret=True)
    dd = ((a[:, None] - b[None]) ** 2).sum(-1)
    dd[:, ~valid] = np.inf
    np.testing.assert_array_equal(np.asarray(idx), dd.argmin(1))
    np.testing.assert_allclose(np.asarray(d2), dd.min(1), rtol=1e-4,
                               atol=1e-4)


def test_topk_matches_dense():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(128, 3)).astype(np.float32)
    b = rng.normal(size=(64, 3)).astype(np.float32)
    valid = np.ones(64, bool)
    valid[50:] = False
    d2, idx = masked_topk_cdist(jnp.asarray(a), jnp.asarray(b),
                                jnp.asarray(valid), k=5, block_n=128,
                                interpret=True)
    dd = ((a[:, None] - b[None]) ** 2).sum(-1)
    dd[:, ~valid] = np.inf
    ref_idx = np.argsort(dd, axis=1)[:, :5]
    np.testing.assert_array_equal(np.sort(np.asarray(idx), 1),
                                  np.sort(ref_idx, 1))
    np.testing.assert_allclose(np.sort(np.asarray(d2), 1),
                               np.sort(dd, 1)[:, :5], rtol=1e-4, atol=1e-4)


def test_consistency_sum_matches_dense():
    from pose6d_tpu.ops.pallas import masked_consistency_sum
    rng = np.random.default_rng(3)
    P = 256
    ca = rng.normal(size=(P, 3)).astype(np.float32) * 2
    cb = rng.normal(size=(P, 3)).astype(np.float32) * 2
    w = (rng.random(P) > 0.3).astype(np.float32)
    out = masked_consistency_sum(jnp.asarray(ca), jnp.asarray(cb),
                                 jnp.asarray(w), block_i=128, block_j=128,
                                 interpret=True)
    da = np.linalg.norm(ca[:, None] - ca[None], axis=-1)
    db = np.linalg.norm(cb[:, None] - cb[None], axis=-1)
    ref = (np.abs(da - db) * w[:, None]).sum(0)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-3)


def test_consistency_sum_rank_major_matches_dense():
    """Rank-major kernel (pc endpoint = pair_index mod v2, PC distance
    table precomputed + tiled via modular BlockSpec) == dense formula."""
    from pose6d_tpu.ops.pallas import consistency_sum_rank_major
    rng = np.random.default_rng(4)
    v2, k = 128, 3
    P = v2 * k
    ca = rng.normal(size=(P, 3)).astype(np.float32) * 2
    pc = rng.normal(size=(v2, 3)).astype(np.float32) * 2
    w = (rng.random(P) > 0.3).astype(np.float32)
    dpc = np.linalg.norm(pc[:, None] - pc[None], axis=-1).astype(np.float32)
    out = consistency_sum_rank_major(jnp.asarray(ca), jnp.asarray(dpc),
                                     jnp.asarray(w), v2=v2,
                                     block_i=64, block_j=128,
                                     interpret=True)
    cb = pc[np.arange(P) % v2]
    da = np.linalg.norm(ca[:, None] - ca[None], axis=-1)
    db = np.linalg.norm(cb[:, None] - cb[None], axis=-1)
    ref = (np.abs(da - db) * w[:, None]).sum(0)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-3)
