"""Checkpoint averaging (SWA): uniform parameter average over a step
window of a training run's kept checkpoint curve.

    python -m pose6d_tpu.cli.swa --run <run_dir> \
        --min-step 2000 --max-step 8000 --out swa_params.msgpack

Averaging iterates sampled along the optimizer trajectory finds a
flatter point of the loss basin than any single iterate (Izmailov et
al., "Averaging Weights Leads to Wider Optima and Better
Generalization", UAI 2018) — on this pipeline's small-corpus
unseen-category protocol the per-checkpoint held-out IR fluctuates
by +-0.03 (probe_ckpts curves), and the average trades that selection
noise for a stable center. Pairs with cli/probe_ckpts: probe the raw
curve, then probe SWA windows as additional candidates.

The reference has no equivalent (it keeps weights-only dumps and
evaluates the last one, scripts/train.py:135-136).

Writes a bare-params msgpack loadable by cli/eval.py --weights and
scripts/run_unseen_experiment.sh.
"""
from __future__ import annotations

import argparse
from pathlib import Path


def average_checkpoints(paths):
    """Uniform average of the params trees of TrainState msgpacks."""
    import numpy as np
    from flax import serialization

    acc = None
    for p in paths:
        raw = serialization.msgpack_restore(Path(p).read_bytes())
        params = raw["params"] if "params" in raw else raw
        flat = {}

        def _flatten(tree, prefix=""):
            for k, v in tree.items():
                kk = f"{prefix}/{k}"
                if isinstance(v, dict):
                    _flatten(v, kk)
                else:
                    flat[kk] = np.asarray(v, np.float64)

        _flatten(params)
        if acc is None:
            acc = {k: v.copy() for k, v in flat.items()}
            template = params
        else:
            if flat.keys() != acc.keys():
                raise ValueError(f"checkpoint {p} has a different "
                                 "parameter tree; cannot average")
            for k in acc:
                acc[k] += flat[k]
    n = len(paths)

    def _rebuild(tree, prefix=""):
        import numpy as np
        out = {}
        for k, v in tree.items():
            kk = f"{prefix}/{k}"
            if isinstance(v, dict):
                out[k] = _rebuild(v, kk)
            else:
                out[k] = (acc[kk] / n).astype(np.asarray(v).dtype)
        return out

    return _rebuild(template)


def select_paths(run, min_step=0, max_step=10**9, every=1):
    ckpts = sorted(Path(run).glob("ckpt/ckpt_*.msgpack"))
    out = [c for c in ckpts
           if min_step <= int(c.stem.split("_")[1]) <= max_step][::every]
    if not out:
        raise SystemExit(f"no checkpoints in [{min_step}, {max_step}] "
                         f"under {run}/ckpt")
    return out


def main():
    p = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--run", required=True,
                   help="train run dir containing ckpt/ckpt_*.msgpack")
    p.add_argument("--min-step", type=int, default=0)
    p.add_argument("--max-step", type=int, default=10**9)
    p.add_argument("--every", type=int, default=1,
                   help="average every Nth checkpoint in the window")
    p.add_argument("--out", required=True, help="output params msgpack")
    args = p.parse_args()

    paths = select_paths(args.run, args.min_step, args.max_step,
                         args.every)
    steps = [int(c.stem.split("_")[1]) for c in paths]
    avg = average_checkpoints(paths)

    from flax import serialization
    Path(args.out).write_bytes(serialization.msgpack_serialize(avg))
    print(f"averaged {len(paths)} checkpoints "
          f"(steps {steps[0]}..{steps[-1]}) -> {args.out}")


if __name__ == "__main__":
    main()
