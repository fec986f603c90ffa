#!/usr/bin/env python
"""Summarize a pose-stage results tree into one markdown table + JSON.

    python scripts/summarize_tree.py <results_poses_*/ dir> [...more dirs]

Reads the per-instance txt files (reference format, train/pose_stage.py)
and prints per-object n / mean IR / ADD / ADD<0.1d / ADD-S<0.1d /
median rotation error, plus the across-object mean row the README
tables quote.
"""
from __future__ import annotations

import json
import re
import sys
from pathlib import Path

import numpy as np

FIELDS = {
    "ir": r"Inlier ration of P_pred: ([0-9.eE+-]+)",
    "add_icp": r"Avg. Euclidean Distance \(ADD\) ICP: ([0-9.eE+-]+)",
    "add_score_icp": r"Add Score ICP thres: ([0-9.eE+-]+)",
    "adds_score_icp": r"Add-S Score ICP: ([0-9.eE+-]+)",
    "err_deg": r"Error \[deg\]: ([0-9.eE+-]+)",
}


def summarize(tree: Path):
    per_obj = {}
    for txt in sorted((tree / "results").glob("obj_*_result_*.txt")):
        obj = int(txt.name.split("_")[1])
        s = txt.read_text()
        rec = {}
        for k, pat in FIELDS.items():
            m = re.search(pat, s)
            if m:
                rec[k] = float(m.group(1))
        per_obj.setdefault(obj, []).append(rec)

    rows = {}
    for obj in sorted(per_obj):
        rs = per_obj[obj]
        rows[f"obj_{obj}"] = {
            "n": len(rs),
            "ir": float(np.mean([r["ir"] for r in rs])),
            "add_cm": float(np.mean([r["add_icp"] for r in rs])),
            "add_score": float(np.mean([r["add_score_icp"] for r in rs])),
            "adds_score": float(np.mean([r["adds_score_icp"] for r in rs])),
            "rot_err_deg_median": float(np.median(
                [r["err_deg"] for r in rs])),
        }
    if rows:
        rows["mean"] = {
            k: float(np.mean([v[k] for v in rows.values()]))
            for k in ("ir", "add_score", "adds_score")}
        rows["mean"]["n"] = int(sum(v["n"] for v in rows.values()
                                    if "add_cm" in v))
    return rows


def main():
    for arg in sys.argv[1:]:
        tree = Path(arg)
        rows = summarize(tree)
        print(f"\n## {tree}")
        print("| object | n | IR | ADD [cm] | ADD<0.1d | ADD-S<0.1d "
              "| rot err median [deg] |")
        print("|---|---|---|---|---|---|---|")
        for name, v in rows.items():
            if name == "mean":
                continue
            print(f"| {name} | {v['n']} | {v['ir']:.3f} | "
                  f"{v['add_cm']:.2f} | {v['add_score']:.3f} | "
                  f"{v['adds_score']:.3f} | "
                  f"{v['rot_err_deg_median']:.1f} |")
        if "mean" in rows:
            m = rows["mean"]
            print(f"| **mean** | {m['n']} | {m['ir']:.3f} | — | "
                  f"{m['add_score']:.3f} | {m['adds_score']:.3f} | — |")
        (tree / "summary.json").write_text(json.dumps(rows, indent=1))
        print(f"(json -> {tree / 'summary.json'})")


if __name__ == "__main__":
    main()
