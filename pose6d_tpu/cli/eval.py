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
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="dump a jax.profiler trace of the eval loop")
    args = p.parse_args()
    cfg = load(args)
    import jax

    from ..models import DPFMNet
    from ..train.eval_loop import build_eval_dataset, evaluate
    from ..train.loop import load_pretrained_params

    ds = build_eval_dataset(cfg)
    model = DPFMNet(cfg.model)
    cad, pc, _ = ds[0]
    from ..data.pipeline import make_sample
    s = make_sample(cad, pc, _)
    template = model.init(jax.random.PRNGKey(0), s["cad"], s["pc"])
    params = load_pretrained_params(args.weights, template)
    save_dir = cfg.save_results if args.save_results else None
    if args.profile:
        from ..utils.profiling import profile_trace
        with profile_trace(args.profile):
            evaluate(cfg, params, dataset=ds, save_dir=save_dir)
    else:
        evaluate(cfg, params, dataset=ds, save_dir=save_dir)


if __name__ == "__main__":
    main()
