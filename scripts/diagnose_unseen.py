"""Per-object failure diagnosis for the unseen-category protocol.

Consumes the eval-export npzs (train/eval_loop.py result_*.npz) of an
experiment tree and answers, per held-out object:

  1. Is the failure pose-dependent? (per-frame IR vs GT rotation angle,
     and vs in-frame depth/translation)
  2. Is it a symmetry confusion? For each frame, fit a rigid transform
     to the PREDICTED correspondences (cad_xyz[p_i] -> align_pc[q_i];
     align_pc is the observed cloud moved into the CAD frame, so a
     perfect correspondence set fits the identity) and histogram its
     rotation magnitude: a mode near 180 deg = flip confusion, a broad
     uniform spread = featureless encoder output.
  3. How self-similar is the CAD? Normalized chamfer distance between
     the model and its 180-degree rotations about each principal axis
     (low value = near-symmetry the encoder cannot break from geometry
     alone).

Usage:
    python scripts/diagnose_unseen.py /tmp/r3_unseen_final \
        --objects 5 6 8 11 12 --out docs/diagnostics/unseen_r3.jsonl
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def rot_angle_deg(R):
    return float(np.degrees(np.arccos(np.clip((np.trace(R) - 1) / 2,
                                              -1.0, 1.0))))


def kabsch(src, dst):
    """Least-squares R,t aligning src->dst (numpy, no weights)."""
    mu_s, mu_d = src.mean(0), dst.mean(0)
    H = (src - mu_s).T @ (dst - mu_d)
    U, _, Vt = np.linalg.svd(H)
    S = np.diag([1.0, 1.0, np.sign(np.linalg.det(Vt.T @ U.T))])
    R = Vt.T @ S @ U.T
    return R, mu_d - R @ mu_s


def chamfer(a, b):
    """Mean nearest-neighbor distance a->b (blocked)."""
    out = np.empty(len(a))
    for i in range(0, len(a), 512):
        d = np.linalg.norm(a[i:i + 512, None] - b[None], axis=-1)
        out[i:i + 512] = d.min(1)
    return float(out.mean())


def self_similarity(cad, diam):
    """Chamfer(CAD, rot180_axis(CAD))/diam about centered principal axes."""
    c = cad - cad.mean(0)
    # principal axes so the flip set matches solvers/multistart.py
    cov = c.T @ c
    _, V = np.linalg.eigh(cov)
    out = {}
    for k, ax in enumerate(V.T[::-1]):          # major, mid, minor
        K = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]],
                      [-ax[1], ax[0], 0]])
        R = np.eye(3) + 2.0 * (K @ K)           # Rodrigues, theta=pi
        sub = c[:: max(1, len(c) // 1500)]
        out[f"axis{k}"] = round(chamfer(sub @ R.T, sub) / diam, 4)
    return out


def analyze_object(npz_dir: Path, min_pairs: int = 8):
    frames = []
    for f in sorted(npz_dir.glob("result_*.npz")):
        z = np.load(f)
        rec = {"frame": f.stem, "ir": float(z["ir"]),
               "rot_gt_deg": rot_angle_deg(np.asarray(z["R_m2c"])),
               "z_mm": float(np.asarray(z["t_m2c"])[2])}
        p = np.asarray(z["p_pred"])
        if len(p) >= min_pairs:
            src = np.asarray(z["cad_xyz"])[p[:, 0]]
            dst = np.asarray(z["align_pc"])[p[:, 1]]
            R, t = kabsch(src, dst)
            rec["pred_fit_rot_deg"] = rot_angle_deg(R)
            rec["pred_fit_rms"] = float(np.sqrt(
                ((src @ R.T + t - dst) ** 2).sum(-1).mean()))
        rec["n_pairs"] = int(len(p))
        frames.append(rec)
    return frames


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("tree", help="experiment out dir with obj<k>/ subdirs")
    ap.add_argument("--objects", type=int, nargs="+",
                    default=(5, 6, 8, 11, 12))
    ap.add_argument("--models",
                    default="/root/reference/sample-data/lm/models")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from pose6d_tpu.data import read_ply
    from pose6d_tpu.data.decimate import decimate_mesh
    models = Path(args.models)
    info = json.loads((models / "models_info.json").read_text())

    records = []
    for o in args.objects:
        frames = analyze_object(Path(args.tree) / f"obj{o}")
        mesh = read_ply(models / f"obj_{o:06d}.ply")
        v, _ = decimate_mesh(mesh["verts"], mesh["faces"], 10000)
        diam = info[str(o)]["diameter"]
        sym = self_similarity(v, diam)
        irs = np.array([f["ir"] for f in frames])
        angs = np.array([f["rot_gt_deg"] for f in frames])
        fit = np.array([f.get("pred_fit_rot_deg", np.nan) for f in frames])
        # IR/rotation correlation over frames
        corr = (float(np.corrcoef(irs, angs)[0, 1])
                if len(irs) > 2 else float("nan"))
        summary = {
            "obj": o, "n_frames": len(frames),
            "mean_ir": round(float(irs.mean()), 4),
            "ir_rot_corr": round(corr, 3),
            "frac_fit_near_identity": round(
                float(np.nanmean(fit < 30)), 3),
            "frac_fit_near_180": round(
                float(np.nanmean(fit > 150)), 3),
            "median_fit_rot_deg": round(float(np.nanmedian(fit)), 1),
            "self_sim_chamfer_over_diam": sym,
        }
        print(json.dumps(summary))
        records.append({"summary": summary, "frames": frames})

    if args.out:
        out = Path(args.out)
        out.parent.mkdir(parents=True, exist_ok=True)
        with out.open("w") as fh:
            for r in records:
                fh.write(json.dumps(r) + "\n")
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
