"""Checkpoint-curve probe: held-out IR for every kept checkpoint.

Post-hoc early stopping. The train loop keeps the whole checkpoint
curve (train.checkpoint_keep); this command sweeps it against one or
more held-out eval sets and reports mean/per-object IR per step, so the
peak checkpoint can be selected on held-out data instead of train loss
(the reference has no equivalent — it saves weights-only dumps and
picks the last one, scripts/train.py:135-136).

    python -m pose6d_tpu.cli.probe_ckpts --config config/unseen_lm300.yaml \
        --run /tmp/pose6d_logs/<run> \
        --eval-names synth_eval_obj5 synth_eval_obj6 ... \
        --out /tmp/probe.jsonl [--every 2] [--min-step 0]

One process sweeps the whole curve: the eval forward passes parameters
as an argument into a single set of compiled programs
(train.eval_loop.make_eval_fns), so only the first checkpoint pays the
compile.
"""
from __future__ import annotations

import json
from pathlib import Path

from ._common import base_parser, load


def restore_params_from_trainstate(path, template_params):
    """Pull just the params leaf out of a full TrainState msgpack.

    TrainState serializes as {'params', 'opt_state', 'step'}; restoring
    onto the params template validates shapes without having to rebuild
    the optimizer."""
    from flax import serialization
    raw = serialization.msgpack_restore(Path(path).read_bytes())
    return serialization.from_state_dict(template_params, raw["params"])


def main():
    p = base_parser(__doc__)
    p.add_argument("--run", required=True,
                   help="train run dir containing ckpt/ckpt_*.msgpack")
    p.add_argument("--eval-names", nargs="+", required=True,
                   help="eval dataset render_data_name values to probe")
    p.add_argument("--out", default=None, help="JSONL output path")
    p.add_argument("--every", type=int, default=1,
                   help="probe every Nth kept checkpoint")
    p.add_argument("--min-step", type=int, default=0)
    p.add_argument("--pad-cad", type=int, default=None,
                   help="override CAD pad size (small fixtures / tests)")
    p.add_argument("--pad-pc", type=int, default=None)
    args = p.parse_args()
    cfg = load(args)

    import jax

    from ..data.pipeline import make_sample
    from ..models import DPFMNet
    from ..train.eval_loop import build_eval_dataset, make_eval_fns

    ckpts = sorted(Path(args.run).glob("ckpt/ckpt_*.msgpack"))
    ckpts = [c for c in ckpts
             if int(c.stem.split("_")[1]) >= args.min_step][::args.every]
    if not ckpts:
        raise SystemExit(f"no checkpoints under {args.run}/ckpt")

    datasets = {}
    for name in args.eval_names:
        cfg.eval_dataset.render_data_name = name
        datasets[name] = build_eval_dataset(cfg)

    sample_kw = {}
    if args.pad_cad:
        sample_kw["v_cad"] = args.pad_cad
    if args.pad_pc:
        sample_kw["v_pc"] = args.pad_pc

    model = DPFMNet(cfg.model)
    cad, pc, extra = next(iter(datasets.values()))[0]
    s = make_sample(cad, pc, extra, **sample_kw)
    template = model.init(jax.random.PRNGKey(0), s["cad"], s["pc"])
    fwd, solver, ir_fn = make_eval_fns(
        model, cfg.eval.solver == "spatial_filtering")

    # materialize every eval batch ON DEVICE once — the chip sits behind
    # a slow host tunnel, so re-uploading the (identical) batches for
    # each of dozens of checkpoints would dominate the sweep
    import numpy as np

    from ..data.pipeline import HostLoader
    n_fmap = cfg.model.n_fmap
    kw = {"v_cad": cfg.pad_v_cad, "v_pc": cfg.pad_v_pc}
    kw.update(sample_kw)
    cached = []  # (eval_name, device_batch)
    for name, ds in datasets.items():
        loader = HostLoader(ds, cfg.eval.batch_size, shuffle=False,
                            drop_last=False, **kw)
        for batch in loader:
            cached.append((name, jax.device_put(batch)))

    out = open(args.out, "a") if args.out else None
    best = (-1.0, None)
    for c in ckpts:
        step = int(c.stem.split("_")[1])
        params = jax.device_put(
            restore_params_from_trainstate(c, template))
        per_obj_sum, per_obj_cnt = {}, {}
        for _, batch in cached:
            o = fwd(params, batch["cad"], batch["pc"])
            pairs, pvalid = solver(
                o["C"], batch["cad"]["evecs"][:, :, :n_fmap],
                batch["pc"]["evecs"][:, :, :n_fmap],
                batch["cad"]["xyz"], batch["pc"]["xyz"],
                batch["cad"]["valid"], batch["pc"]["valid"],
                batch["diam_cad"])
            irs = np.asarray(ir_fn(pairs, pvalid, batch["cad"]["xyz"],
                                   batch["align_pc"],
                                   0.1 * batch["diam_cad"]))
            for b in range(irs.shape[0]):
                k = int(batch["obj_id"][b])
                per_obj_sum[k] = per_obj_sum.get(k, 0.0) + float(irs[b])
                per_obj_cnt[k] = per_obj_cnt.get(k, 0) + 1
        per_obj_all = {f"obj_{k}": per_obj_sum[k] / per_obj_cnt[k]
                       for k in sorted(per_obj_sum)}
        mean_ir = sum(per_obj_sum.values()) / sum(per_obj_cnt.values())
        rec = {"step": step, "mean_ir": round(mean_ir, 4),
               "per_obj": {k: round(v, 4) for k, v in per_obj_all.items()}}
        line = json.dumps(rec)
        print(line, flush=True)
        if out:
            out.write(line + "\n")
            out.flush()
        if mean_ir > best[0]:
            best = (mean_ir, step)
    print(f"BEST step {best[1]} mean_ir {best[0]:.4f}", flush=True)
    if out:
        out.write(json.dumps({"best_step": best[1],
                              "best_mean_ir": round(best[0], 4)}) + "\n")
        out.close()


if __name__ == "__main__":
    main()
