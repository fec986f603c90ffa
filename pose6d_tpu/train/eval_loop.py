"""Correspondence evaluation + result export (reference scripts/eval.py).

Per sample: model forward -> fmap2pointmap solver -> inlier ratio;
aggregates IR overall and per object id; optionally saves one .npz per
sample (the fixed-shape equivalent of eval.py's [CAD, PC, Obj] .pt
dumps, eval.py:110-120) for the pose stage (cli/pose.py) to consume.
"""
from __future__ import annotations

from pathlib import Path

import jax
import numpy as np

from ..data.dataset import BOPObjectDataset
from ..data.pipeline import HostLoader
from ..models import DPFMNet
from ..solvers import (naive_fmap2pointmap,
                       spatial_filtering_fmap2pointmap)
from . import metrics as metrics_mod


def build_eval_dataset(cfg):
    d = cfg.eval_dataset
    return BOPObjectDataset(
        cfg.data_root, d.render_data_name, mode=d.mode, min_vis=d.min_vis,
        cache_dir=cfg.cache_dir, lbo_pc=d.lbo_pc, obj_take=d.obj_take,
        num_samples=d.num_samples, models_dir=d.models_dir,
        target_faces=cfg.target_faces, pc_lbo_backend=d.pc_lbo_backend)


def evaluate(cfg, params, dataset=None, save_dir=None,
             sample_kw: dict | None = None):
    """Returns (mean_ir, per_object_ir dict); writes result npzs."""
    dataset = dataset if dataset is not None else build_eval_dataset(cfg)
    kw = {"v_cad": cfg.pad_v_cad, "v_pc": cfg.pad_v_pc}
    kw.update(sample_kw or {})
    loader = HostLoader(dataset, cfg.eval.batch_size, shuffle=False,
                        drop_last=False, **kw)
    model = DPFMNet(cfg.model)
    n_fmap = cfg.model.n_fmap
    fwd = jax.jit(jax.vmap(lambda c, p: model.apply(params, c, p)))

    use_spatial = cfg.eval.solver == "spatial_filtering"
    if use_spatial:
        solver = jax.jit(jax.vmap(
            lambda C, ex, ey, cx, px, vx, vy, d:
            spatial_filtering_fmap2pointmap(C, ex, ey, cx, px, vx, vy, d)))
    else:
        solver = jax.jit(jax.vmap(
            lambda C, ex, ey, cx, px, vx, vy, d:
            naive_fmap2pointmap(C, ex, ey, vx, vy)))

    ir_fn = jax.jit(jax.vmap(metrics_mod.inlier_ratio))

    save_dir = Path(save_dir) if save_dir else (
        Path(cfg.save_results) if cfg.save_results else None)
    if save_dir:
        save_dir.mkdir(parents=True, exist_ok=True)

    all_ir, per_obj = [], {}
    idx = 0
    for batch in loader:
        out = fwd(batch["cad"], batch["pc"])
        pairs, pvalid = solver(
            out["C"], batch["cad"]["evecs"][:, :, :n_fmap],
            batch["pc"]["evecs"][:, :, :n_fmap],
            batch["cad"]["xyz"], batch["pc"]["xyz"],
            batch["cad"]["valid"], batch["pc"]["valid"],
            batch["diam_cad"])
        irs = np.asarray(ir_fn(pairs, pvalid, batch["cad"]["xyz"],
                               batch["align_pc"], 0.1 * batch["diam_cad"]))
        B = irs.shape[0]
        for b in range(B):
            obj_id = int(batch["obj_id"][b])
            ir = float(irs[b])
            all_ir.append(ir)
            per_obj.setdefault(obj_id, []).append(ir)
            if save_dir:
                nv_c = int(np.asarray(batch["cad"]["valid"][b]).sum())
                nv_p = int(np.asarray(batch["pc"]["valid"][b]).sum())
                pv = np.asarray(pvalid[b])
                pr = np.asarray(pairs[b])[:, pv]
                np.savez(
                    save_dir / f"result_{idx:06d}.npz",
                    p_pred=pr.T,              # (N, 2) like reference P_pred
                    C_pred=np.asarray(out["C"][b]),
                    ir=ir,
                    cad_xyz=np.asarray(batch["cad"]["xyz"][b])[:nv_c],
                    pcd_depth=np.asarray(batch["pc"]["xyz"][b])[:nv_p],
                    align_pc=np.asarray(batch["align_pc"][b])[:nv_p],
                    R_m2c=np.asarray(batch["R_m2c"][b]),
                    t_m2c=np.asarray(batch["t_m2c"][b]),
                    diam_cad=float(batch["diam_cad"][b]),
                    obj_id=obj_id,
                    overlap12=np.asarray(out["overlap12"][b])[:nv_c],
                    overlap21=np.asarray(out["overlap21"][b])[:nv_p],
                    # truncated bases enable post-hoc re-solving
                    # (cli/resolve.py, reference scripts/eval_2.py)
                    evecs_cad=np.asarray(
                        batch["cad"]["evecs"][b])[:nv_c, :n_fmap],
                    evecs_pc=np.asarray(
                        batch["pc"]["evecs"][b])[:nv_p, :n_fmap])
            idx += 1
    mean_ir = float(np.mean(all_ir)) if all_ir else 0.0
    per_obj_mean = {k: float(np.mean(v)) for k, v in sorted(per_obj.items())}
    print(f"overall IR: {mean_ir:.4f}")
    for k, v in per_obj_mean.items():
        print(f"  obj_{k} IR: {v:.4f} (n={len(per_obj[k])})")
    return mean_ir, per_obj_mean
