"""Correspondence evaluation CLI (reference scripts/eval.py).

    python -m pose6d_tpu.cli.eval --config config/lm.yaml \
        --weights weights.pt_or_params.msgpack
"""
from __future__ import annotations

from ._common import add_multihost_args, base_parser, load


def main():
    p = base_parser(__doc__)
    add_multihost_args(p)
    p.add_argument("--weights", required=True)
    p.add_argument("--save-results", action="store_true",
                   help="write per-frame result npzs to cfg.save_results "
                        "for the pose stage (reference eval.py:110-120 "
                        "always saves; opt-in here because the npzs carry "
                        "full bases and are large)")
    p.add_argument("--eval-names", nargs="+", default=None,
                   help="sweep several eval sets (render_data_name "
                        "values) in ONE process, reusing the compiled "
                        "programs (compile dominates short evals on a "
                        "fresh process); results go to "
                        "<save_results>/<name>/")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="dump a jax.profiler trace of the eval loop")
    args = p.parse_args()
    # argparse's greedy nargs='+' swallows trailing positional overrides
    # ("--eval-names a b train.lr=1e-3"); reroute anything with '=' so
    # both orderings work instead of silently evaluating a fake dataset
    if args.eval_names:
        moved = [n for n in args.eval_names if "=" in n]
        args.eval_names = [n for n in args.eval_names if "=" not in n]
        args.overrides = list(args.overrides) + moved
    cfg = load(args)
    import jax

    from ..models import DPFMNet
    from ..train.eval_loop import (build_eval_dataset, evaluate,
                                   make_eval_fns)
    from ..train.loop import load_pretrained_params

    model = DPFMNet(cfg.model)
    if args.eval_names:
        import dataclasses
        from pathlib import Path
        cfgs = [dataclasses.replace(cfg, eval_dataset=dataclasses.replace(
            cfg.eval_dataset, render_data_name=n)) for n in args.eval_names]
    else:
        cfgs = [cfg]
    ds = build_eval_dataset(cfgs[0])
    cad, pc, _ = ds[0]
    from ..data.pipeline import make_sample
    s = make_sample(cad, pc, _)
    template = model.init(jax.random.PRNGKey(0), s["cad"], s["pc"])
    params = load_pretrained_params(args.weights, template)
    fns = make_eval_fns(model, cfg.eval.solver == "spatial_filtering")

    def run_all():
        for i, c in enumerate(cfgs):
            d = ds if i == 0 else build_eval_dataset(c)
            if args.eval_names:
                name = c.eval_dataset.render_data_name
                print(f"=== {name}")
                save_dir = (Path(cfg.save_results) / name
                            if args.save_results else None)
            else:
                save_dir = cfg.save_results if args.save_results else None
            evaluate(c, params, dataset=d, save_dir=save_dir,
                     eval_fns=fns)

    if args.profile:
        from ..utils.profiling import profile_trace
        with profile_trace(args.profile):
            run_all()
    else:
        run_all()


if __name__ == "__main__":
    main()
