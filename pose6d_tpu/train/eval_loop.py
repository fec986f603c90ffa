"""Correspondence evaluation + result export (reference scripts/eval.py).

Per sample: model forward -> fmap2pointmap solver -> inlier ratio;
aggregates IR overall and per object id; optionally saves one .npz per
sample (the fixed-shape equivalent of eval.py's [CAD, PC, Obj] .pt
dumps, eval.py:110-120) for the pose stage (cli/pose.py) to consume.
"""
from __future__ import annotations

import functools
from pathlib import Path

import jax
import jax.numpy as jnp
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
        target_faces=cfg.target_faces, pc_lbo_backend=d.pc_lbo_backend,
        build_gradients=d.build_gradients or cfg.model.with_gradient_features)


class _Subset:
    """Index view over a dataset (this host's shard of the frame list)."""

    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = np.asarray(indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.dataset[int(self.indices[i])]


def make_eval_fns(model, use_spatial: bool):
    """Jitted (fwd, solver, ir_fn) for the eval loop.

    `fwd` takes params as an explicit argument (not a closure) so one
    set of compiled programs serves many checkpoints — the
    checkpoint-curve probe (cli/probe_ckpts.py) loops dozens of
    parameter sets through the same traced computation."""
    fwd = jax.jit(jax.vmap(
        lambda prm, c, p: model.apply(prm, c, p), in_axes=(None, 0, 0)))
    if use_spatial:
        solver = jax.jit(jax.vmap(
            lambda C, ex, ey, cx, px, vx, vy, d:
            spatial_filtering_fmap2pointmap(C, ex, ey, cx, px, vx, vy, d)))
    else:
        solver = jax.jit(jax.vmap(
            lambda C, ex, ey, cx, px, vx, vy, d:
            naive_fmap2pointmap(C, ex, ey, vx, vy)))
    ir_fn = jax.jit(jax.vmap(metrics_mod.inlier_ratio))
    return fwd, solver, ir_fn


def _tta_rotation_bank(n: int):
    from ..solvers.multistart import so3_bank
    return so3_bank(n)


@functools.lru_cache(maxsize=1)
def _rotate_pc_fn():
    """Rigidly rotate each cloud about its valid-point centroid; padded
    rows stay zero. Rigid motion keeps every cached spectral quantity
    valid (see train/augment.py)."""
    def rot(xyz, valid, R3):
        vf = valid.astype(xyz.dtype)[:, None]
        c = jnp.sum(xyz * vf, 0) / jnp.maximum(jnp.sum(vf), 1.0)
        return jnp.where(vf > 0, (xyz - c) @ R3.T + c, 0.0)
    return jax.jit(jax.vmap(rot, in_axes=(0, 0, None)))


@functools.lru_cache(maxsize=4)
def _depth_score_fn(hyps: int):
    """Candidate-map scorer: cheap RANSAC pose from the candidate's
    correspondences, then depth-render consistency against the splatted
    observed depth (solvers/verify_pose.py). Lower is better. This is
    the flip-disambiguation evidence moved up to map selection."""
    from ..solvers import ransac_pose
    from ..solvers.verify_pose import depth_consistency_score

    def one(key, cad_xyz, cad_valid, pc_xyz, pairs, pvalid, diam, K,
            obs_z, obs_mask):
        src = cad_xyz[pairs[0]]
        dst = pc_xyz[pairs[1]]
        est = ransac_pose(key, src, dst, pvalid, threshold=0.05,
                          n_hypotheses=hyps)
        return depth_consistency_score(cad_xyz, cad_valid, est["R"],
                                       est["t"], K, obs_z, obs_mask,
                                       diam)

    return jax.jit(jax.vmap(one))


@functools.lru_cache(maxsize=8)
def _zoomout_fn(zk: int, step: int, gate_tau: float):
    """Batched ZoomOut refinement, cached so repeated evaluate() calls
    (multi-set sweeps, checkpoint probes) reuse one compiled program."""
    from ..solvers.zoomout import zoomout_refine

    return jax.jit(jax.vmap(
        lambda C, ex, ey, vx, vy, cx, px, d: zoomout_refine(
            C, ex[:, :zk], ey[:, :zk], vx, vy, step=step,
            cad_xyz=cx, pc_xyz=px, diam=d, gate_tau=gate_tau)))


def _batch_candidates(fwd, solver, refine, params, batch, rot_bank,
                      n_fmap, k_cols):
    """Candidate maps for one batch, each as (out, pairs, pvalid):
    the raw prediction, its ZoomOut upsampling when on, and the same
    pair for every non-identity rotation in the TTA bank. The base
    candidate is always first (it wins selection ties). Selection (not
    replacement) keeps refinements from hurting samples whose base map
    is already strong — measured: zk=64 gated moved obj12 0.094->0.154
    but obj8 0.297->0.243 as a replacement."""
    def candidates(pc):
        out = fwd(params, batch["cad"], pc)
        cands = [(out, *solver(
            out["C"], batch["cad"]["evecs"][:, :, :n_fmap],
            pc["evecs"][:, :, :n_fmap],
            batch["cad"]["xyz"], pc["xyz"],
            batch["cad"]["valid"], pc["valid"],
            batch["diam_cad"]))]
        if refine is not None:
            C_r = refine(out["C"], batch["cad"]["evecs"],
                         pc["evecs"], batch["cad"]["valid"],
                         pc["valid"], batch["cad"]["xyz"],
                         pc["xyz"], batch["diam_cad"])
            cands.append((out, *solver(
                C_r, batch["cad"]["evecs"][:, :, :k_cols],
                pc["evecs"][:, :, :k_cols],
                batch["cad"]["xyz"], pc["xyz"],
                batch["cad"]["valid"], pc["valid"],
                batch["diam_cad"])))
        return cands

    cand_list = candidates(batch["pc"])
    if rot_bank is not None:
        rotate = _rotate_pc_fn()
        for R3 in rot_bank[1:]:  # bank[0] is the identity
            pc_r = dict(batch["pc"])
            pc_r["xyz"] = rotate(batch["pc"]["xyz"],
                                 batch["pc"]["valid"], jnp.asarray(R3))
            cand_list.extend(candidates(pc_r))
    return cand_list


def _select_winner(cfg, batch, cand_list, idx):
    """Per-sample winner over candidate maps (lower score = better).

    Signal: depth-render consistency of a cheap RANSAC pose per
    candidate (select_by=depth; falls back to spatial-filter survivor
    counts without intrinsics). Non-base candidates carry a hysteresis
    handicap (select_margin), and alternatives only compete at all on
    samples whose base map is weak (select_trigger) — strong base maps
    are never replaced."""
    margin = 1.0 + getattr(cfg.eval, "select_margin", 0.15)
    select_by = getattr(cfg.eval, "select_by", "depth")
    Ks = np.asarray(batch["K"])
    hws = np.asarray(batch["im_hw"])
    use_depth = (select_by == "depth"
                 and float(np.abs(Ks).sum(axis=(1, 2)).min()) > 0
                 and bool((hws == hws[0]).all()))
    if use_depth:
        # splat the observed clouds once per batch — shared evidence
        # for every candidate
        from .pose_stage import _splat_observed
        h, w = int(hws[0][0]), int(hws[0][1])
        pcs = np.asarray(batch["pc"]["xyz"])
        pvs = np.asarray(batch["pc"]["valid"])
        obs = [_splat_observed(pcs[b][pvs[b]], Ks[b], h, w)
               for b in range(pcs.shape[0])]
        obs_z = jnp.asarray(np.stack([o[0] for o in obs]))
        obs_m = jnp.asarray(np.stack([o[1] for o in obs]))
        scorer = _depth_score_fn(
            getattr(cfg.eval, "select_hypotheses", 2048))
        keys = jax.random.split(
            jax.random.fold_in(jax.random.PRNGKey(7), idx),
            pcs.shape[0])
        smat = []
        for ci, (o, pr, pv) in enumerate(cand_list):
            s = np.asarray(scorer(
                keys, batch["cad"]["xyz"], batch["cad"]["valid"],
                batch["pc"]["xyz"], pr, pv, batch["diam_cad"],
                batch["K"], obs_z, obs_m))
            smat.append(s * (margin if ci else 1.0))
    else:
        smat = [-(np.asarray(pv).sum(axis=-1) / (margin if ci else 1.0))
                for ci, (_, _, pv) in enumerate(cand_list)]
    winner = np.stack(smat).argmin(axis=0)        # (B,)
    o0, pr0, pv0 = cand_list[0]
    # weak-base engagement: strong base maps are never replaced
    trigger = getattr(cfg.eval, "select_trigger", 0.25)
    base_surv = np.asarray(pv0).sum(axis=-1)
    n_pc = np.asarray(batch["pc"]["valid"]).sum(axis=-1)
    winner = np.where(base_surv < trigger * n_pc, winner, 0)
    # np.array (copy): np.asarray of a device array is a read-only
    # view, and these are rowwise-updated below
    out = {k: np.array(v) for k, v in o0.items()}
    pairs, pvalid = np.array(pr0), np.array(pv0)
    for ci in range(1, len(cand_list)):
        sel = np.where(winner == ci)[0]
        if sel.size:
            o, pr, pv = cand_list[ci]
            pairs[sel] = np.asarray(pr)[sel]
            pvalid[sel] = np.asarray(pv)[sel]
            for k, v in o.items():
                out[k][sel] = np.asarray(v)[sel]
    return out, pairs, pvalid


def evaluate(cfg, params, dataset=None, save_dir=None,
             sample_kw: dict | None = None, eval_fns=None):
    """Returns (mean_ir, per_object_ir dict); writes result npzs.

    Multi-host: each process evaluates its strided shard of the frame
    list (parallel/multihost.py) and per-object IR sums are allreduced
    at the end; single-process this is the identity path.
    """
    from ..parallel import allreduce_metric_sums, shard_frame_list
    dataset = dataset if dataset is not None else build_eval_dataset(cfg)
    frame_idx = shard_frame_list(len(dataset))
    dataset = _Subset(dataset, frame_idx)
    kw = {"v_cad": cfg.pad_v_cad, "v_pc": cfg.pad_v_pc}
    kw.update(sample_kw or {})
    loader = HostLoader(dataset, cfg.eval.batch_size, shuffle=False,
                        drop_last=False, **kw)
    model = DPFMNet(cfg.model)
    n_fmap = cfg.model.n_fmap
    use_spatial = cfg.eval.solver == "spatial_filtering"
    fwd, solver, ir_fn = (eval_fns if eval_fns is not None
                          else make_eval_fns(model, use_spatial))

    save_dir = Path(save_dir) if save_dir else (
        Path(cfg.save_results) if cfg.save_results else None)
    if save_dir:
        save_dir.mkdir(parents=True, exist_ok=True)

    # eval-time ZoomOut: refine the predicted map into a wider cached
    # basis before solving for correspondences (off by default)
    zk = getattr(cfg.eval, "zoomout_k", 0)
    k_cols = zk if zk else n_fmap
    refine = (_zoomout_fn(zk, cfg.eval.zoomout_step,
                          cfg.eval.zoomout_gate_tau) if zk else None)

    tta = getattr(cfg.eval, "tta_rotations", 0)
    if (tta > 1 or refine is not None) and not use_spatial:
        raise ValueError("eval.tta_rotations / eval.zoomout_k need the "
                         "spatial_filtering solver: its survivor count "
                         "is the candidate-selection signal")
    rot_bank = _tta_rotation_bank(tta) if tta > 1 else None

    # Per-device batch sharding (SURVEY §2.4): with >1 local device,
    # place each batch sharded over a 1-D data mesh — the jitted
    # fwd/solver/ir programs follow their input shardings under GSPMD,
    # so every eval stage runs data-parallel with no code changes.
    # (Multi-host frame sharding above composes with this: frames per
    # process, batch rows per device.)
    mesh = None
    if jax.device_count() > 1:
        from ..parallel.mesh import make_mesh, shard_batch
        mesh = make_mesh()

    all_ir, per_obj = [], {}
    idx = 0
    for batch in loader:
        if mesh is not None and (
                batch["diam_cad"].shape[0] % len(mesh.devices) == 0):
            batch = shard_batch(batch, mesh)
        cand_list = _batch_candidates(fwd, solver, refine, params,
                                      batch, rot_bank, n_fmap, k_cols)
        if len(cand_list) == 1:
            out, pairs, pvalid = cand_list[0]
        else:
            out, pairs, pvalid = _select_winner(cfg, batch, cand_list,
                                                idx)
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
                # name by GLOBAL frame index so shards never collide
                gidx = int(dataset.indices[idx])
                np.savez(
                    save_dir / f"result_{gidx:06d}.npz",
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
                    # intrinsics (zeros when the sample cache predates
                    # the K field) for depth-render flip disambiguation
                    K=np.asarray(batch["K"][b]),
                    im_hw=np.asarray(batch["im_hw"][b]),
                    overlap12=np.asarray(out["overlap12"][b])[:nv_c],
                    overlap21=np.asarray(out["overlap21"][b])[:nv_p],
                    # truncated bases enable post-hoc re-solving
                    # (cli/resolve.py, reference scripts/eval_2.py)
                    evecs_cad=np.asarray(
                        batch["cad"]["evecs"][b])[:nv_c, :n_fmap],
                    evecs_pc=np.asarray(
                        batch["pc"]["evecs"][b])[:nv_p, :n_fmap])
            idx += 1
    # cross-host aggregation: fixed-size per-object accumulators so
    # every host contributes the same-shaped arrays (identity when
    # single-process)
    max_obj = 256
    if per_obj and max(per_obj) >= max_obj:
        # all hosts must contribute same-shaped arrays, so the
        # accumulator cannot grow dynamically — fail loudly rather than
        # silently dropping high-id objects from the means
        raise ValueError(
            f"object id {max(per_obj)} >= per-object accumulator size "
            f"{max_obj}; raise max_obj in eval_loop.evaluate")
    ir_sum = np.zeros(max_obj, np.float64)
    cnt = np.zeros(max_obj, np.float64)
    for k, v in per_obj.items():
        ir_sum[k] += float(np.sum(v))
        cnt[k] += len(v)
    agg = allreduce_metric_sums({"ir_sum": ir_sum, "count": cnt})
    tot = float(agg["count"].sum())
    mean_ir = float(agg["ir_sum"].sum() / tot) if tot else 0.0
    per_obj_mean = {int(k): float(agg["ir_sum"][k] / agg["count"][k])
                    for k in np.nonzero(agg["count"])[0]}
    print(f"overall IR: {mean_ir:.4f}")
    for k, v in per_obj_mean.items():
        print(f"  obj_{k} IR: {v:.4f} (n={int(agg['count'][k])})")
    return mean_ir, per_obj_mean
