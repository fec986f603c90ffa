"""Port the reference's pretrained torch checkpoint into DPFMNet params.

The reference ships weights/weights.pt (epoch-490 state dict, SURVEY
§2.1 C21). This maps every tensor into the flax param tree — Linear
weights transpose (out,in)->(in,out), 1x1 Conv1d weights drop the
kernel axis and transpose. Used for numerical-parity eval against the
reference's committed results without retraining.
"""
from __future__ import annotations

import numpy as np


def _lin(sd, key):
    w = np.asarray(sd[f"{key}.weight"], np.float32)
    b = np.asarray(sd[f"{key}.bias"], np.float32)
    if w.ndim == 3:  # Conv1d kernel_size=1: (out, in, 1)
        w = w[:, :, 0]
    return {"kernel": w.T, "bias": b}


def port_reference_checkpoint(state_dict) -> dict:
    """torch state dict (or dict of arrays) -> flax params for DPFMNet."""
    sd = {k: np.asarray(getattr(v, "numpy", lambda: v)())
          for k, v in state_dict.items()}

    fe = {}
    fe["first_lin"] = _lin(sd, "feature_extractor.first_lin")
    fe["last_lin"] = _lin(sd, "feature_extractor.last_lin")
    for b in (0, 1):
        blk = {"diffusion_time": np.asarray(
            sd[f"feature_extractor.block_{b}.diffusion.diffusion_time"],
            np.float32)}
        mlp = {}
        for i in range(3):
            mlp[f"layer_{i:03d}"] = _lin(
                sd, f"feature_extractor.block_{b}.mlp.miniMLP_mlp_layer_{i:03d}")
        blk["mlp"] = mlp
        fe[f"block_{b}"] = blk

    fr = {}
    fr["first_lin"] = _lin(sd, "feat_refiner.first_lin")
    fr["last_lin"] = _lin(sd, "feat_refiner.last_lin")
    li = 0
    while f"feat_refiner.layers.{li}.attn.merge.weight" in sd:
        base = f"feat_refiner.layers.{li}"
        attn = {
            # reference proj order: 0=query, 1=key, 2=value
            # (modeling/dpfm.py:53: zip(self.proj, (query, key, value)))
            "proj_q": _lin(sd, f"{base}.attn.proj.0"),
            "proj_k": _lin(sd, f"{base}.attn.proj.1"),
            "proj_v": _lin(sd, f"{base}.attn.proj.2"),
            "merge": _lin(sd, f"{base}.attn.merge"),
        }
        mlp = {
            # reference MLP Sequential indices: 0=conv, 1=InstanceNorm,
            # 2=ReLU, 3=conv (modeling/dpfm.py:16-26)
            "lin_0": _lin(sd, f"{base}.mlp.0"),
            "lin_1": _lin(sd, f"{base}.mlp.3"),
        }
        fr[f"layer_{li}"] = {"attn": attn, "mlp": mlp}
        li += 1
    fr["overlap"] = {
        "lin0": _lin(sd, "feat_refiner.overlap_predictor.overlap_score_net.0"),
        "lin1": _lin(sd, "feat_refiner.overlap_predictor.overlap_score_net.2"),
    }
    return {"params": {"feature_extractor": fe, "feat_refiner": fr}}


def load_reference_checkpoint(path: str) -> dict:
    """Load weights.pt with torch (host-side, one-time) and port."""
    import torch
    sd = torch.load(path, map_location="cpu")
    return port_reference_checkpoint(sd)


def extend_first_lin_input(params: dict, extra_in: int) -> dict:
    """Widen the encoder's first_lin input by `extra_in` zero columns.

    Makes an xyz-trained parameter tree (ported weights.pt or a native
    checkpoint) a *function-preserving* warm start for an
    input_features="xyz_hks" model: the appended HKS channels initially
    contribute exactly 0, so the extended model reproduces the xyz
    model bit-for-bit, then training grows into the intrinsic channels.
    """
    import jax.numpy as jnp
    out = {k: v for k, v in params.items()}
    p = dict(out["params"])
    fe = dict(p["feature_extractor"])
    fl = dict(fe["first_lin"])
    k = fl["kernel"]                      # (c_in, width)
    fl["kernel"] = jnp.concatenate(
        [k, jnp.zeros((extra_in, k.shape[1]), k.dtype)], axis=0)
    fe["first_lin"] = fl
    p["feature_extractor"] = fe
    out["params"] = p
    return out
