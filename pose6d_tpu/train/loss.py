"""Training losses: Frobenius fmap + weighted-BCE overlap + NCE contrastive.

Mirrors the reference's DPFMLoss (utils/loss.py:8-99 and DPFM's
WeightedBCELoss), rebuilt masked and batched:

* FrobeniusLoss: sum of squared entries, clamped to [-1, 1000], meaned
  over the batch (loss.py:12-15).
* WeightedBCELoss: per-element BCE weighted by inverse class frequency
  (w_neg = mean(gt) applied to negatives, w_pos = 1 - mean(gt) to
  positives), restricted to valid points.
* NCE softmax: nce_num_pairs GT pairs sampled per step, logits =
  -cdist(query, key)/T against identity labels (loss.py:24-42). The
  reference loops over the batch in Python (loss.py:78-84); here the
  whole thing is one vmap.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.geometry import pairwise_sqdist
from ..ops.masking import masked_mean


@dataclasses.dataclass(frozen=True)
class DPFMLossConfig:
    # reference config/dpfm_orig.gin:60-64
    w_fmap: float = 1.0
    w_acc: float = 1.0
    w_nce: float = 1.0
    nce_t: float = 0.07
    nce_num_pairs: int = 512


def frobenius_loss(C_pred, C_gt):
    """Per-sample clamped squared Frobenius distance."""
    loss = jnp.sum((C_pred - C_gt) ** 2, axis=(-2, -1))
    return jnp.clip(loss, -1.0, 1000.0)


def weighted_bce(pred, gt, valid, eps: float = 1e-7):
    """Class-frequency-weighted binary cross-entropy over valid points."""
    v = valid.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    p = jnp.clip(pred, eps, 1.0 - eps)
    bce = -(gt * jnp.log(p) + (1.0 - gt) * jnp.log(1.0 - p))
    w_neg = masked_mean(gt, v)          # fraction of positives
    w_pos = 1.0 - w_neg
    w = jnp.where(gt >= 0.5, w_pos, w_neg)
    # reference torch.mean runs over all points; masked mean here
    return masked_mean(w * bce, v)


def nce_softmax_loss(key, feat1, feat2, pairs, pairs_valid, nce_t: float,
                     num_pairs: int):
    """InfoNCE over a random subsample of GT correspondence pairs.

    feat1 (V1, C) CAD features, feat2 (V2, C) PC features; pairs
    (P, 2) int [cad_idx, pc_idx]; pairs_valid (P,).
    """
    # sample num_pairs valid slots without replacement (gumbel top-k)
    g = jax.random.gumbel(key, pairs_valid.shape)
    score = jnp.where(pairs_valid, g, -jnp.inf)
    _, sel = jax.lax.top_k(score, num_pairs)
    sel_valid = pairs_valid[sel]
    q_idx = pairs[sel, 0]
    k_idx = pairs[sel, 1]

    def l2n(f):
        # eps inside the sqrt — zero rows (padded) would otherwise emit
        # NaN gradients through the norm
        return f * jax.lax.rsqrt(jnp.sum(f * f, axis=-1, keepdims=True)
                                 + 1e-12)

    q = l2n(feat1)[q_idx]
    k = l2n(feat2)[k_idx]
    d = jnp.sqrt(jnp.maximum(pairwise_sqdist(q, k), 1e-12))
    logits = -d / nce_t
    # invalid keys must not act as negatives
    logits = jnp.where(sel_valid[None, :], logits, -jnp.inf)
    logp = jax.nn.log_softmax(logits, axis=-1)
    diag = jnp.diagonal(logp)
    return -masked_mean(diag, sel_valid)


def solve_c_gt(cgt_A, cgt_B, ridge: float = 1e-6):
    """C_gt from precomputed normal equations (== lstsq over GT pairs,
    reference utils/utils.py:67-80)."""
    k = cgt_A.shape[-1]
    A = cgt_A + ridge * jnp.eye(k, dtype=cgt_A.dtype)
    return jnp.linalg.solve(A, cgt_B)


def dpfm_loss(key, out: dict, batch: dict,
              cfg: DPFMLossConfig = DPFMLossConfig()):
    """Total loss over a batch. `out` = vmapped DPFMNet outputs;
    `batch` = collated pipeline batch. Returns (loss, logs dict)."""
    B = batch["cgt_A"].shape[0]
    C_gt = jax.vmap(solve_c_gt)(batch["cgt_A"], batch["cgt_B"])
    fmap = jnp.mean(frobenius_loss(out["C"], C_gt)) * cfg.w_fmap

    acc = jax.vmap(weighted_bce)(out["overlap12"], batch["overlap12"],
                                 batch["cad"]["valid"])
    acc += jax.vmap(weighted_bce)(out["overlap21"], batch["overlap21"],
                                  batch["pc"]["valid"])
    acc_loss = jnp.mean(acc) * cfg.w_acc

    keys = jax.random.split(key, B)
    nce = jax.vmap(
        lambda k_, f1, f2, p, pv: nce_softmax_loss(
            k_, f1, f2, p, pv, cfg.nce_t, cfg.nce_num_pairs)
    )(keys, out["feat1"], out["feat2"], batch["pairs"],
      batch["pairs_valid"])
    nce_loss = jnp.mean(nce) * cfg.w_nce

    total = fmap + acc_loss + nce_loss
    return total, {"loss": total, "fmap_loss": fmap, "acc_loss": acc_loss,
                   "nce_loss": nce_loss}
