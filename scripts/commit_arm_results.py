#!/usr/bin/env python
"""Collect a training-arm's probe curve + held-out eval into a
committable results tree.

    python scripts/commit_arm_results.py --tag hks_aug_step900 \
        --probe /tmp/r4_probe_hks.jsonl \
        --eval-dir /tmp/r4_hks_eval56 \
        --note "xyz_hks warm start + rot60 augmentation, CPU fine-tune"

Reads per-instance IRs straight from the eval result npzs (each carries
its own `ir` — train/eval_loop.py), so the summary never depends on
parsing a chain log. Writes results_synth_unseen/<tag>/ with:
  probe_curve.jsonl   checkpoint-selection evidence (copied verbatim)
  measurements.jsonl  one record in the r4_evaltime format
  README.md           per-object table vs the committed baseline
"""
from __future__ import annotations

import argparse
import json
import shutil
from pathlib import Path

import numpy as np

# eval56 per-object IRs of the committed round-3 checkpoint
# (results_synth_unseen/r4_evaltime/measurements.jsonl:eval56_base)
BASELINE = {5: 0.1315, 6: 0.1885, 8: 0.2971, 11: 0.1857, 12: 0.0941}


def collect_irs(eval_dir: Path):
    per_obj: dict[int, list[float]] = {}
    for f in sorted(eval_dir.rglob("result_*.npz")):
        if "all_results" in f.parts:   # merged copies for the joint pose
            continue                   # stage — don't double-count
        r = np.load(f)
        per_obj.setdefault(int(r["obj_id"]), []).append(float(r["ir"]))
    return {k: float(np.mean(v)) for k, v in sorted(per_obj.items())}, \
           {k: len(v) for k, v in sorted(per_obj.items())}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True)
    ap.add_argument("--probe")
    ap.add_argument("--eval-dir", required=True)
    ap.add_argument("--eval-name", default="synth_eval56 (56 frames/obj)")
    ap.add_argument("--ckpt", default="runs_r4/hks_aug_best.msgpack")
    ap.add_argument("--note", default="")
    args = ap.parse_args()

    out = Path("results_synth_unseen") / args.tag
    out.mkdir(parents=True, exist_ok=True)
    if args.probe and Path(args.probe).exists():
        shutil.copyfile(args.probe, out / "probe_curve.jsonl")

    irs, ns = collect_irs(Path(args.eval_dir))
    mean_ir = float(np.mean(list(irs.values()))) if irs else 0.0
    rec = {"exp": args.tag, "ckpt": args.ckpt, "eval": args.eval_name,
           "ir": {f"obj{k}": round(v, 4) for k, v in irs.items()},
           "n": ns, "mean_ir": round(mean_ir, 4), "note": args.note}
    with open(out / "measurements.jsonl", "a") as fh:
        fh.write(json.dumps(rec) + "\n")

    base_mean = float(np.mean(list(BASELINE.values())))
    lines = [f"# {args.tag}", "",
             args.note, "",
             "| object | n | IR | baseline (r3 ckpt, same frames) | Δ |",
             "|---|---|---|---|---|"]
    for k, v in irs.items():
        b = BASELINE.get(k)
        lines.append(
            f"| obj_{k} | {ns[k]} | {v:.4f} | "
            + (f"{b:.4f} | {v - b:+.4f} |" if b is not None else "– | – |"))
    lines.append(f"| **mean** | {sum(ns.values())} | **{mean_ir:.4f}** | "
                 f"{base_mean:.4f} | {mean_ir - base_mean:+.4f} |")
    (out / "README.md").write_text("\n".join(lines) + "\n")
    print(f"{out}: mean IR {mean_ir:.4f} vs baseline {base_mean:.4f} "
          f"({mean_ir - base_mean:+.4f})")


if __name__ == "__main__":
    main()
