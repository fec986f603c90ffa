"""Eval-time candidate-map generation + evidence-based pose selection.

The measured unseen-object failure mode (docs/diagnostics/README.md) is
globally-consistent-but-rotated functional maps: the spatial filter
cannot reject them (distance consistency is rotation-blind) and the
flip-hypothesis bank cannot rescue them (the wrong pose is not a flip
of the truth). Rotation TTA re-runs the encoder on coarsely rotated
copies of the observed cloud (so3_bank) and ZoomOut upsamples the map
in the cached spectral basis; every candidate map is solved to a pose
and ranked by depth-render consistency — the one evidence channel a
symmetric/rotated-but-consistent map cannot fake
(solvers/verify_pose.py).

Selection safeguards (A/B record: results_synth_unseen/r4_evaltime/):
a weak-base trigger keeps strong base maps unconditionally (blanket
replacement measurably hurts them), and the base candidate gets a
score handicap (margin) so near-ties resolve to the unmodified path.

Shared by api.Predictor and bench.py — one traced program, the static
candidate bank unrolls at jit time.
"""
from __future__ import annotations

import jax.numpy as jnp

from .fmap2pointmap import spatial_filtering_fmap2pointmap
from .icp import icp_cloud_to_model
from .ransac import ransac_pose


def candidate_maps(model_apply, cad, pc, diam, n_fmap: int,
                   tta_rotations: int = 0, zoomout_k: int = 0):
    """Return (base_out, [(C, evec_cols), ...]); base candidate first.

    tta_rotations: how many so3_bank rotations to test (0/1 = off).
    zoomout_k: upsample the base map to this basis size (0 = off).
    """
    out = model_apply(cad, pc)
    cands = [(out["C"], n_fmap)]
    if zoomout_k:
        from .zoomout import zoomout_refine
        C_r = zoomout_refine(out["C"], cad["evecs"][:, :zoomout_k],
                             pc["evecs"][:, :zoomout_k],
                             cad["valid"], pc["valid"],
                             cad_xyz=cad["xyz"], pc_xyz=pc["xyz"],
                             diam=diam, gate_tau=0.15)
        cands.append((C_r, zoomout_k))
    if tta_rotations > 1:
        from .multistart import so3_bank
        vf = pc["valid"].astype(pc["xyz"].dtype)[:, None]
        c = jnp.sum(pc["xyz"] * vf, 0) / jnp.maximum(jnp.sum(vf), 1.0)
        for R3 in so3_bank(tta_rotations)[1:]:
            xyz_r = jnp.where(vf > 0,
                              (pc["xyz"] - c) @ jnp.asarray(R3).T + c, 0.0)
            out_r = model_apply(cad, {**pc, "xyz": xyz_r})
            cands.append((out_r["C"], n_fmap))
    return out, cands


def candidate_select_pose(model_apply, cad, pc, diam, key, K, obs_z,
                          mask, *, n_fmap: int, tta_rotations: int = 0,
                          zoomout_k: int = 0,
                          ransac_hypotheses: int = 4096,
                          icp_iters: int = 30,
                          icp_coarse_stride: int = 4,
                          select_margin: float = 0.15,
                          select_trigger: float = 0.25):
    """Candidate maps -> per-candidate RANSAC pose -> depth-render
    score -> in-trace winner select -> ICP against the observed cloud.

    model_apply: (cad, pc) -> model outputs (params already bound).
    Returns the _run_model_and_pose dict plus 'candidate' (winner id;
    0 = unmodified base path).
    """
    from .verify_pose import depth_consistency_score
    out, cands = candidate_maps(
        model_apply, cad, pc, diam, n_fmap=n_fmap,
        tta_rotations=tta_rotations, zoomout_k=zoomout_k)
    Rs, ts, inls, scores = [], [], [], []
    base_surv = None
    for ci, (C, k) in enumerate(cands):
        pairs, pvalid = spatial_filtering_fmap2pointmap(
            C, cad["evecs"][:, :k], pc["evecs"][:, :k],
            cad["xyz"], pc["xyz"], cad["valid"], pc["valid"], diam)
        if ci == 0:
            base_surv = jnp.sum(pvalid)
        pose = ransac_pose(key, cad["xyz"][pairs[0]],
                           pc["xyz"][pairs[1]], pvalid,
                           threshold=0.05 * diam,
                           n_hypotheses=ransac_hypotheses, hyp_block=512)
        s = depth_consistency_score(cad["xyz"], cad["valid"],
                                    pose["R"], pose["t"], K,
                                    obs_z, mask, diam)
        scores.append(s * (1.0 + select_margin if ci else 1.0))
        Rs.append(pose["R"])
        ts.append(pose["t"])
        inls.append(pose["n_inliers"])
    engaged = base_surv < select_trigger * jnp.sum(pc["valid"])
    winner = jnp.where(engaged, jnp.argmin(jnp.stack(scores)), 0)
    R0, t0 = jnp.stack(Rs)[winner], jnp.stack(ts)[winner]
    icp = icp_cloud_to_model(cad["xyz"], cad["valid"], pc["xyz"],
                             pc["valid"], R0, t0,
                             max_corr_dist=0.2 * diam,
                             max_iter=icp_iters,
                             coarse_stride=icp_coarse_stride)
    return {"R": icp["R"], "t": icp["t"],
            "n_inliers": jnp.stack(inls)[winner],
            "overlap12": out["overlap12"], "overlap21": out["overlap21"],
            "C": out["C"], "icp_rmse": icp["rmse"], "candidate": winner}
