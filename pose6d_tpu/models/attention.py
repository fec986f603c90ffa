"""Cross-attention feature refinement + overlap prediction (mask-aware).

Mirrors the behavior of the reference's attention stack
(reference modeling/dpfm.py:16-151): 1x1-conv MLP with InstanceNorm,
multi-head attention with a (dim, heads) channel split, bidirectional
sequential cross-attention with residuals, and a sigmoid overlap head on
L2-normalized refined features. The V1 x V2 attention runs as one fused
masked softmax-matmul pair on the MXU — no empty_cache crutches, no
subsampled-attention workaround (reference modeling/dpfm.py:100-118);
for larger point budgets the Pallas blockwise kernel in
ops/pallas/attention.py drops in.

All of the reference's attention configurations exist: the default
attention_type="normal" / cross_sampling_ratio=1.0 path (the one its
shipped config + weights use), attention_type="double" (reference
modeling/dpfm.py:75-131: widened attention dim, last_lin emitting
n_in + overlap_feat_dim, the overlap head fed from the extra split),
and a *working* subsampled cross-attention path with nn_interpolate —
the reference's ratio<1 branch dereferences an undefined variable
(modeling/dpfm.py:107); here the sampled side attends, then PointNet++
3-NN inverse-distance interpolation scatters features back to the full
set with static shapes.
"""
from __future__ import annotations

import contextlib

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.masking import masked_mean, masked_softmax

# While True, attention traces the portable XLA path even on TPU —
# needed when one trace must lower for several platforms (multi-platform
# jax.export: the Pallas flash kernel is a TPU-only custom call).
_PORTABLE_TRACE = False


@contextlib.contextmanager
def portable_lowering():
    """Force the XLA attention path for the enclosed traces (see
    serving.export_predictor multi-platform export)."""
    global _PORTABLE_TRACE
    prev = _PORTABLE_TRACE
    _PORTABLE_TRACE = True
    try:
        yield
    finally:
        _PORTABLE_TRACE = prev


def masked_instance_norm(x, valid, eps: float = 1e-5):
    """InstanceNorm over the point axis per channel, affine-free.

    x (V, C), valid (V,). Matches torch InstanceNorm1d semantics
    (normalize each channel across positions) restricted to valid rows.
    """
    m = valid[:, None]
    mu = masked_mean(x, m, axis=0)
    var = masked_mean((x - mu[None]) ** 2, m, axis=0)
    return (x - mu[None]) / jnp.sqrt(var[None] + eps)


class ConvMLP(nn.Module):
    """1x1-conv MLP: Dense + InstanceNorm + ReLU between layers."""
    dims: tuple  # e.g. (64, 32)

    @nn.compact
    def __call__(self, x, valid):
        n = len(self.dims)
        for i, d in enumerate(self.dims):
            x = nn.Dense(d, name=f"lin_{i}")(x)
            if i + 1 < n:
                x = masked_instance_norm(x, valid)
                x = nn.relu(x)
        return x


class MultiHeadedAttention(nn.Module):
    num_heads: int
    d_model: int
    use_flash: bool = False  # Pallas flash-attention path (TPU)

    @nn.compact
    def __call__(self, query, key, value, q_valid, kv_valid):
        """query (N, d_model), key/value (M, d_model) -> (N, d_model).

        Channel split is (dim, heads) with dim-major order to match the
        reference's view(batch, dim, heads, N) layout — required for
        checkpoint parity.
        """
        dim = self.d_model // self.num_heads
        q = nn.Dense(self.d_model, name="proj_q")(query)
        k = nn.Dense(self.d_model, name="proj_k")(key)
        v = nn.Dense(self.d_model, name="proj_v")(value)
        # (N, d_model) -> (N, dim, heads)
        q = q.reshape(-1, dim, self.num_heads)
        k = k.reshape(-1, dim, self.num_heads)
        v = v.reshape(-1, dim, self.num_heads)
        if (self.use_flash and not _PORTABLE_TRACE
                and jax.default_backend() == "tpu"
                and q.shape[0] % 512 == 0 and k.shape[0] % 512 == 0):
            # flash path: online softmax in VMEM, no (H, N, M) tensor in HBM
            from ..ops.pallas.attention import flash_cross_attention
            out = flash_cross_attention(q, k, v, q_valid, kv_valid,
                                        self.num_heads, 1.0 / (dim ** 0.5))
        else:
            # XLA path: the V1 x V2 score/value matmuls are the FLOPs hot
            # spot; run them as native bf16 MXU passes w/ f32 accumulation.
            bf = jnp.bfloat16
            scores = jnp.einsum("ndh,mdh->hnm", q.astype(bf), k.astype(bf),
                                preferred_element_type=jnp.float32
                                ) / (dim ** 0.5)
            prob = masked_softmax(scores, kv_valid[None, None, :], axis=-1)
            out = jnp.einsum("hnm,mdh->ndh", prob.astype(bf), v.astype(bf),
                             preferred_element_type=jnp.float32)
        out = out.reshape(-1, self.d_model)
        out = nn.Dense(self.d_model, name="merge")(out)
        return out * q_valid[:, None]


class AttentionalPropagation(nn.Module):
    feature_dim: int
    num_heads: int
    use_flash: bool = False

    @nn.compact
    def __call__(self, x, source, x_valid, src_valid):
        message = MultiHeadedAttention(self.num_heads, self.feature_dim,
                                       use_flash=self.use_flash,
                                       name="attn")(x, source, source,
                                                    x_valid, src_valid)
        combined = jnp.concatenate([x, message], axis=-1)
        return ConvMLP((self.feature_dim * 2, self.feature_dim),
                       name="mlp")(combined, x_valid)


def nn_interpolate(sampled_feats, dists, idx):
    """PointNet++-style feature propagation (the working equivalent of
    the reference's DPFM.dpfm.utils.nn_interpolate): features at S
    sampled points -> all V points by inverse-distance-weighted 3-NN.

    sampled_feats (S, C); dists (V, 3) distances to each point's 3
    nearest sampled points; idx (V, 3) their indices into S.
    """
    w = 1.0 / jnp.maximum(dists, 1e-10)
    w = w / jnp.sum(w, axis=1, keepdims=True)
    return jnp.einsum("vk,vkc->vc", w, sampled_feats[idx])


class OverlapPredictorNet(nn.Module):
    overlap_feat_dim: int = 32

    @nn.compact
    def __call__(self, feat_x, feat_y, x_valid, y_valid):
        lin0 = nn.Dense(self.overlap_feat_dim, name="lin0")
        lin1 = nn.Dense(1, name="lin1")

        def head(f):  # shared weights across both shapes (Siamese head)
            # eps inside the sqrt: padded rows are exactly zero and a
            # bare norm would emit NaN gradients there
            norm = f * jax.lax.rsqrt(
                jnp.sum(f * f, axis=-1, keepdims=True) + 1e-12)
            h = lin1(nn.relu(lin0(norm)))
            return nn.sigmoid(h)[:, 0]

        sx = head(feat_x) * x_valid
        sy = head(feat_y) * y_valid
        return sx, sy


class CrossAttentionRefinementNet(nn.Module):
    n_in: int = 32
    num_heads: int = 2
    gnn_dim: int = 32
    n_layers: int = 1
    overlap_feat_dim: int = 32
    use_flash: bool = False
    # "normal": attention at gnn_dim, overlap head on the refined feats.
    # "double": attention at gnn_dim + overlap_feat_dim, last_lin emits
    #           n_in + overlap_feat_dim, overlap head on the extra split
    #           (reference modeling/dpfm.py:75-131).
    attention_type: str = "normal"
    # < 1.0: the x side attends on an FPS subsample and features are
    # propagated back by nn_interpolate (fixes the reference's broken
    # ratio<1 branch, modeling/dpfm.py:100-118).
    cross_sampling_ratio: float = 1.0

    @nn.compact
    def __call__(self, feat_x, feat_y, x_valid, y_valid, x_samples=None):
        """feat_x (V1, n_in), feat_y (V2, n_in) -> refined feats + overlaps.

        x_samples: (idf (S,), idn (V1, 3), dists (V1, 3)) FPS subsample
        of the x side + per-vertex 3 nearest sampled points; required iff
        cross_sampling_ratio < 1.
        """
        if self.attention_type == "normal":
            attn_dim = self.gnn_dim
            out_dim = self.n_in
        elif self.attention_type == "double":
            attn_dim = self.gnn_dim + self.overlap_feat_dim
            out_dim = self.n_in + self.overlap_feat_dim
        else:
            raise ValueError(self.attention_type)
        first = nn.Dense(attn_dim, name="first_lin")
        desc0 = first(feat_x)
        desc1 = first(feat_y)
        subsampled = self.cross_sampling_ratio < 1.0
        if subsampled:
            if x_samples is None:
                raise ValueError("cross_sampling_ratio < 1 requires "
                                 "x_samples (idf, idn, dists)")
            idf, idn, dists = x_samples
            s_valid = x_valid[idf]
        for li in range(self.n_layers):
            layer = AttentionalPropagation(attn_dim, self.num_heads,
                                           use_flash=self.use_flash,
                                           name=f"layer_{li}")
            # Sequential bidirectional update with a shared layer — desc1's
            # update sees the already-updated desc0 (reference
            # modeling/dpfm.py:100-104).
            if subsampled:
                s0 = desc0[idf]
                s0 = s0 + layer(s0, desc1, s_valid, y_valid)
                desc1 = desc1 + layer(desc1, s0, y_valid, s_valid)
                desc0 = nn_interpolate(s0, dists, idn) * x_valid[:, None]
            else:
                desc0 = desc0 + layer(desc0, desc1, x_valid, y_valid)
                desc1 = desc1 + layer(desc1, desc0, y_valid, x_valid)
        last = nn.Dense(out_dim, name="last_lin")
        aug_x = last(desc0) * x_valid[:, None]
        aug_y = last(desc1) * y_valid[:, None]
        ref_x, ref_y = aug_x[:, :self.n_in], aug_y[:, :self.n_in]
        if self.attention_type == "double":
            ov_x, ov_y = aug_x[:, self.n_in:], aug_y[:, self.n_in:]
        else:
            ov_x, ov_y = ref_x, ref_y
        overlap_x, overlap_y = OverlapPredictorNet(
            self.overlap_feat_dim, name="overlap")(ov_x, ov_y,
                                                   x_valid, y_valid)
        return ref_x, ref_y, overlap_x, overlap_y
