"""Pose estimation stage (reference scripts/test_RANSAC.py /
test_teaser.py): consume eval result files, estimate poses with
RANSAC or GNC-TLS, refine with ICP, score ADD / ADD-S / pose errors,
and write per-instance txt + ply dumps + per-object avg_results.txt in
the reference's format.

The reference's ICP target is the GT-transformed CAD (test_RANSAC.py:
436-439) — an eval-protocol choice, kept as icp_target='gt_cad' for
baseline comparability; icp_target='pc' refines against the observed
cloud (the production-inference mode).
"""
from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..data.ply import write_ply_points
from ..ops.masking import pad_to
from ..solvers import (disambiguate_pose_depth, gnc_tls_pose,
                       icp_point2point, ransac_pose)
from . import metrics as metrics_mod

NUM_OBJ = 15  # reference test_RANSAC.py:353
PAIR_PAD = 10240
PT_PAD = 5120


def _pose(R, t):
    T = np.eye(4)
    T[:3, :3] = np.asarray(R)
    T[:3, 3] = np.asarray(t)
    return T


def _splat_observed(pc, K, h: int, w: int):
    """Point-splat the observed cloud back into a depth image (cm) +
    mask — the evidence base for depth-render flip disambiguation. The
    cloud is in camera coordinates, so projecting with the frame's own
    intrinsics reconstructs the (masked, outlier-cleaned, subsampled)
    depth image the cloud came from; a 2x2 footprint fills sampling
    gaps so stride-cells in the verifier stay covered."""
    z = pc[:, 2]
    ok = z > 1e-6
    u = (K[0, 0] * pc[:, 0] / np.maximum(z, 1e-6) + K[0, 2]).astype(int)
    v = (K[1, 1] * pc[:, 1] / np.maximum(z, 1e-6) + K[1, 2]).astype(int)
    ok &= (u >= 0) & (u < w) & (v >= 0) & (v < h)
    depth = np.zeros((h, w), np.float32)
    zs = z[ok]
    for du in (0, 1):
        for dv in (0, 1):
            uu = np.clip(u[ok] + du, 0, w - 1)
            vv = np.clip(v[ok] + dv, 0, h - 1)
            cur = depth[vv, uu]
            depth[vv, uu] = np.where((cur == 0) | (zs < cur), zs, cur)
    return depth, depth > 0


def run_pose_stage(results_dir, out_dir, solver: str = "ransac",
                   ransac_threshold: float = 0.05,
                   ransac_hypotheses: int = 131072,
                   gnc_noise_bound: float = 0.05,
                   icp_threshold: float = 0.2, icp_max_iter: int = 50,
                   icp_target: str = "gt_cad", write_ply: bool = True,
                   disambiguate: bool = False, name_suffix: str = "",
                   seed: int = 0):
    """disambiguate: insert the depth-render flip-disambiguation stage
    (solvers/multistart.py, an addition over the reference) between the
    robust solver and the protocol ICP. Requires result npzs that carry
    the camera intrinsics K (eval runs from this round on); frames
    without K fall through to the undisambiguated path."""
    results_dir = Path(results_dir)
    name = ("results_poses_RANSAC" if solver == "ransac" else
            "results_poses_GNC") + name_suffix
    base = Path(out_dir) / name
    (base / "results").mkdir(parents=True, exist_ok=True)
    if write_ply:  # --no-ply runs must not leave an empty ply/ behind
        (base / "ply").mkdir(parents=True, exist_ok=True)

    files = sorted(results_dir.glob("result_*.npz"))
    acc = {f"obj_{i}_{m}": [] for i in range(1, NUM_OBJ + 1)
           for m in ("add_score", "add", "add_score_xyz", "adds_score")}
    key = jax.random.PRNGKey(seed)

    for i, f in enumerate(files):
        r = dict(np.load(f, allow_pickle=False))
        obj_id = int(r["obj_id"])
        cad = r["cad_xyz"].astype(np.float32)
        pc = r["pcd_depth"].astype(np.float32)
        diam = float(r["diam_cad"])
        P = r["p_pred"].astype(np.int64)
        if len(P) == 0:
            continue
        src = pad_to(cad[P[:, 0]], PAIR_PAD)
        dst = pad_to(pc[P[:, 1]], PAIR_PAD)
        pvalid = np.arange(PAIR_PAD) < len(P)
        key, sub = jax.random.split(key)
        if solver == "ransac":
            est = ransac_pose(sub, jnp.asarray(src), jnp.asarray(dst),
                              jnp.asarray(pvalid),
                              threshold=ransac_threshold,
                              n_hypotheses=ransac_hypotheses)
        else:
            est = gnc_tls_pose(jnp.asarray(src), jnp.asarray(dst),
                               jnp.asarray(pvalid),
                               noise_bound=gnc_noise_bound, key=sub)
        T_est = _pose(est["R"], est["t"])
        T_gt = _pose(r["R_m2c"], r["t_m2c"])

        cad_p = jnp.asarray(pad_to(cad, PT_PAD))
        cad_v = jnp.asarray(np.arange(PT_PAD) < len(cad))

        # flip disambiguation (between solver and protocol ICP): rank
        # the flip-hypothesis bank by depth-image consistency; the
        # chosen pose feeds the ICP below, while the pre-ICP metrics
        # keep scoring the raw solver output
        flip_hyp = -1
        if disambiguate and "K" in r and float(np.abs(r["K"]).sum()) > 0:
            hw = r["im_hw"] if "im_hw" in r else np.asarray([480, 640])
            h, w = int(hw[0]), int(hw[1])
            obs_z, obs_mask = _splat_observed(pc, r["K"], h, w)
            pc_p = jnp.asarray(pad_to(pc, PT_PAD))
            pc_v = jnp.asarray(np.arange(PT_PAD) < len(pc))
            fix = disambiguate_pose_depth(
                cad_p, cad_v, pc_p, pc_v,
                jnp.asarray(T_est[:3, :3].astype(np.float32)),
                jnp.asarray(T_est[:3, 3].astype(np.float32)),
                jnp.float32(diam), jnp.asarray(r["K"], jnp.float32),
                jnp.asarray(obs_z), jnp.asarray(obs_mask))
            T_icp_init = _pose(fix["R"], fix["t"])
            flip_hyp = int(fix["hypothesis"])
        else:
            T_icp_init = T_est

        # pre-ICP metrics (reference test_RANSAC.py:406-420)
        add_e, add_s = metrics_mod.add_score(
            jnp.asarray(T_est), jnp.asarray(T_gt), cad_p, diam, cad_v)
        add_xyz = metrics_mod.add_score_xyz(
            jnp.asarray(T_est), jnp.asarray(T_gt), cad_p, diam, cad_v)
        adds_e, adds_s = metrics_mod.adds_score(
            jnp.asarray(T_est), jnp.asarray(T_gt), cad_p, diam, cad_v)

        # ICP refinement
        if icp_target == "gt_cad":
            tgt = np.asarray(metrics_mod.transform(cad, jnp.asarray(T_gt)))
        else:
            tgt = pc
        tgt_p = jnp.asarray(pad_to(tgt.astype(np.float32), PT_PAD))
        tgt_v = jnp.asarray(np.arange(PT_PAD) < len(tgt))
        icp = icp_point2point(
            cad_p, cad_v, tgt_p, tgt_v,
            jnp.asarray(T_icp_init[:3, :3].astype(np.float32)),
            jnp.asarray(T_icp_init[:3, 3].astype(np.float32)),
            max_corr_dist=icp_threshold,
            max_iter=icp_max_iter)
        T_icp = _pose(icp["R"], icp["t"])

        add_e2, add_s2 = metrics_mod.add_score(
            jnp.asarray(T_icp), jnp.asarray(T_gt), cad_p, diam, cad_v)
        add_xyz2 = metrics_mod.add_score_xyz(
            jnp.asarray(T_icp), jnp.asarray(T_gt), cad_p, diam, cad_v)
        adds_e2, adds_s2 = metrics_mod.adds_score(
            jnp.asarray(T_icp), jnp.asarray(T_gt), cad_p, diam, cad_v)
        err_cm = float(np.linalg.norm(r["t_m2c"] - T_icp[:3, 3]))
        err_deg = float(np.degrees(metrics_mod.angular_error_rad(
            jnp.asarray(r["R_m2c"]), jnp.asarray(T_icp[:3, :3]))))

        if 1 <= obj_id <= NUM_OBJ:
            acc[f"obj_{obj_id}_add_score"].append(float(add_s2))
            acc[f"obj_{obj_id}_add"].append(float(add_e2))
            acc[f"obj_{obj_id}_add_score_xyz"].append(float(add_xyz2))
            acc[f"obj_{obj_id}_adds_score"].append(float(adds_s2))

        extra = (f"Flip hypothesis: {flip_hyp}\n"
                 if disambiguate and flip_hyp >= 0 else "")
        txt = base / "results" / f"obj_{obj_id}_result_{i}.txt"
        txt.write_text(
            f"Object ID: {obj_id}\n"
            f"Inlier ration of P_pred: {float(r['ir'])}\n"
            f"Num. of correspondences: {len(P)}\n"
            f"Avg. Euclidean Distance (ADD) [cm]: {float(add_e)}\n"
            f"Add Score thres: {float(add_s)}\n"
            f"Add Score thres (xyz direction): {float(add_xyz)}\n"
            f"Add-S Score: {float(adds_s)}\n"
            f"Avg. Euclidean Distance (ADD) ICP: {float(add_e2)}\n"
            f"Add Score ICP thres: {float(add_s2)}\n"
            f"Add Score ICP thres (xyz direction): {float(add_xyz2)}\n"
            f"Add-S Score ICP: {float(adds_s2)}\n"
            f"Error [cm]: {err_cm}\n"
            f"Error [deg]: {err_deg}\n"
            f"T_gt (Ground Truth Transformation):\n{T_gt}\n"
            f"T_pred (Predicted Transformation):\n{T_est}\n"
            f"T_pred_ICP (Predicted Transformation from ICP):\n{T_icp}\n"
            + extra)

        if write_ply:
            d = base / "ply" / f"obj_{obj_id}_result_{i}"
            d.mkdir(parents=True, exist_ok=True)
            write_ply_points(d / f"cad_{i}.ply", cad)
            write_ply_points(
                d / f"cad_{i}_pose_est.ply",
                np.asarray(metrics_mod.transform(cad, jnp.asarray(T_icp))))
            write_ply_points(
                d / f"cad_{i}_pose_gt.ply",
                np.asarray(metrics_mod.transform(cad, jnp.asarray(T_gt))))
            write_ply_points(d / f"pc_{i}.ply", pc)

    with open(base / "avg_results.txt", "w") as fh:
        for m in ("add_score", "add", "add_score_xyz", "adds_score"):
            for o in range(1, NUM_OBJ + 1):
                lst = acc[f"obj_{o}_{m}"]
                avg = float(np.mean(lst)) if lst else 0
                fh.write(f"Average for obj_{o}_{m}: {avg}\n")
    return acc
