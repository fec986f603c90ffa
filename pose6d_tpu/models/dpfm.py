"""DPFMNet: Siamese DiffusionNet + cross-attention refinement + fmap head.

Assembly mirrors the reference model (reference models/dpfm.py:14-82):
shared DiffusionNet encoder over CAD and partial-cloud branches (the PC
branch uses only mass/evals/evecs — the reference nulls L/grads at
models/dpfm.py:51, and the spectral diffusion method needs neither),
cross-attention refinement with overlap prediction, and the regularized
functional-map solve truncated to n_fmap=30.

Single-sample module: batch with jax.vmap over a dict of padded arrays.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from .attention import CrossAttentionRefinementNet
from .diffusion_net import DiffusionNet
from .fmap import solve_fmap


@dataclasses.dataclass(frozen=True)
class DPFMConfig:
    """Model hyperparameters (reference config/dpfm_orig.yaml)."""
    c_in: int = 3
    n_feat: int = 32
    width: int = 64
    n_blocks: int = 2
    n_fmap: int = 30
    k_eig: int = 64
    lambda_: float = 100.0
    resolvent_gamma: float = 0.5
    robust: bool = True
    num_heads: int = 2
    gnn_dim: int = 32
    ref_n_layers: int = 1
    overlap_feat_dim: int = 32
    # Input normalization (reference models/dpfm.py:53: (xyz-110)/50).
    norm_shift: float = 110.0
    norm_scale: float = 50.0
    # Encoder input assembly. The reference feeds raw xyz only
    # (models/dpfm.py:53); "hks"/"xyz_hks" add intrinsic heat-kernel-
    # signature channels (ops/hks.py) — pose-invariant by construction,
    # aimed at the unseen-protocol generalization gap. c_in stays the
    # reference-parity field for the xyz path; first_lin infers its
    # input width, so the extra channels need no shape bookkeeping.
    # any underscore-joined combo of {xyz, hks, wks}, e.g. "xyz_hks"
    input_features: str = "xyz"
    n_hks: int = 16
    n_wks: int = 16
    # Pallas flash-attention path for the refiner (TPU, shapes % 512;
    # non-TPU backends fall back to the XLA path automatically).
    # Default ON: the XLA path's masked softmax materializes the full
    # (B, H, V2, V1) f32 score tensor — the single hottest fusion of
    # the forward at production shapes (76 of 97 ms device time per
    # 16-frame batch, r5 trace); flash measured 2.5x faster end-to-end
    # forward with |delta C| ~ 1.6e-3 (bf16 noise scale, both paths
    # compute scores in bf16).
    use_flash: bool = True
    # Model-variant switches matching the reference's config space:
    # tangent-gradient features in DiffusionNet (models/dpfm.py:28-29;
    # shapes must then carry gather-form grad_idx/grad_cx/grad_cy) and
    # the refiner's attention_type / cross-attention subsampling
    # (modeling/dpfm.py:71-118).
    with_gradient_features: bool = False
    with_gradient_rotations: bool = True
    attention_type: str = "normal"
    cross_sampling_ratio: float = 1.0

    @classmethod
    def from_yaml_dict(cls, cfg: dict) -> "DPFMConfig":
        """Build from the reference's dpfm_orig.yaml structure."""
        f, a, o = cfg["fmap"], cfg["attention"], cfg["overlap"]
        return cls(
            c_in=f["C_in"], n_feat=f["n_feat"], n_fmap=f["n_fmap"],
            # capacity knobs beyond the reference's config surface (its
            # DiffusionNet hardcodes width 64 / 2 blocks, models/dpfm.py:22-30)
            width=int(f.get("width", 64)),
            n_blocks=int(f.get("n_blocks", 2)),
            k_eig=f["k_eig"], lambda_=float(f["lambda_"]),
            resolvent_gamma=float(f["resolvant_gamma"]), robust=f["robust"],
            num_heads=a["num_head"], gnn_dim=a["gnn_dim"],
            ref_n_layers=a["ref_n_layers"],
            overlap_feat_dim=o["overlap_feat_dim"],
            attention_type=a.get("attention_type", "normal"),
            use_flash=bool(a.get("use_flash", True)),
            cross_sampling_ratio=float(a.get("cross_sampling_ratio", 1.0)),
            with_gradient_features=bool(
                f.get("with_gradient_features", False)),
            with_gradient_rotations=bool(
                f.get("with_gradient_rotations", True)),
            input_features=str(f.get("input_features", "xyz")),
            n_hks=int(f.get("n_hks", 16)),
            n_wks=int(f.get("n_wks", 16)))


class DPFMNet(nn.Module):
    cfg: DPFMConfig = DPFMConfig()

    @nn.compact
    def __call__(self, cad: dict, pc: dict):
        """Forward one (CAD, partial-cloud) pair.

        cad/pc dicts of padded arrays:
          xyz (V, 3), mass (V,), evals (K,), evecs (V, K), valid (V,) bool.

        Returns dict:
          C (n_fmap, n_fmap) functional map CAD->PC,
          overlap12 (V1,), overlap21 (V2,) sigmoid overlap scores,
          feat1/feat2 (V, n_feat) features fed to the fmap head,
          ref_feat1/ref_feat2 refined features.
        """
        c = self.cfg
        encoder = DiffusionNet(c_in=c.c_in, c_out=c.n_feat, width=c.width,
                               n_blocks=c.n_blocks,
                               with_gradient_features=c.with_gradient_features,
                               with_gradient_rotations=c.with_gradient_rotations,
                               name="feature_extractor")

        def branch(shape):
            parts = []
            if "xyz" in c.input_features:
                parts.append((shape["xyz"] - c.norm_shift) / c.norm_scale)
            if "hks" in c.input_features:
                from ..ops.hks import heat_kernel_signature
                parts.append(heat_kernel_signature(
                    shape["evals"], shape["evecs"], shape["mass"],
                    shape["valid"], n_t=c.n_hks))
            if "wks" in c.input_features:
                from ..ops.hks import wave_kernel_signature
                parts.append(wave_kernel_signature(
                    shape["evals"], shape["evecs"], shape["mass"],
                    shape["valid"], n_e=c.n_wks))
            feats = jnp.concatenate(parts, axis=-1)
            grad = None
            if c.with_gradient_features:
                grad = (shape["grad_idx"], shape["grad_cx"],
                        shape["grad_cy"])
            return encoder(feats, shape["mass"], shape["evals"],
                           shape["evecs"], shape["valid"], grad)

        feat1 = branch(cad)
        feat2 = branch(pc)

        x_samples = None
        if c.cross_sampling_ratio < 1.0:
            from ..ops.sampling import farthest_point_sample, knn
            n_s = max(int(c.cross_sampling_ratio * feat1.shape[0]), 8)
            idf, s_valid = farthest_point_sample(cad["xyz"], cad["valid"],
                                                 n_s)
            dists, idn = knn(cad["xyz"], cad["valid"], cad["xyz"][idf],
                             s_valid, k=3)
            x_samples = (idf, idn, dists)

        ref1, ref2, overlap12, overlap21 = CrossAttentionRefinementNet(
            n_in=c.n_feat, num_heads=c.num_heads, gnn_dim=c.gnn_dim,
            n_layers=c.ref_n_layers, overlap_feat_dim=c.overlap_feat_dim,
            use_flash=c.use_flash, attention_type=c.attention_type,
            cross_sampling_ratio=c.cross_sampling_ratio,
            name="feat_refiner")(feat1, feat2, cad["valid"], pc["valid"],
                                 x_samples)

        use1, use2 = (ref1, ref2) if c.robust else (feat1, feat2)

        k = c.n_fmap
        # evecs_trans = Phi[:, :k]^T diag(mass)  (reference models/dpfm.py:66-75)
        et1 = cad["evecs"][:, :k].T * cad["mass"][None, :]
        et2 = pc["evecs"][:, :k].T * pc["mass"][None, :]
        C = solve_fmap(use1, use2, cad["evals"][:k], pc["evals"][:k],
                       et1, et2, lambda_=c.lambda_, gamma=c.resolvent_gamma)
        return {
            "C": C, "overlap12": overlap12, "overlap21": overlap21,
            "feat1": use1, "feat2": use2,
            "ref_feat1": ref1, "ref_feat2": ref2,
        }
