"""Cache build CLI (reference scripts/generate_cache.py): iterate every
dataset sample once so preprocessing + LBO operators land in the cache.

    python -m pose6d_tpu.cli.generate_cache --config config/lm.yaml
"""
from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from ._common import base_parser, load


def main():
    p = base_parser(__doc__)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--eval", action="store_true",
                   help="build the eval dataset cache instead of train")
    p.add_argument("--platform", default="cpu",
                   help="JAX platform for preprocessing ops (cache build "
                        "is host-side work; cpu avoids hogging the chip)")
    args = p.parse_args()
    import jax
    jax.config.update("jax_platforms", args.platform)
    cfg = load(args)
    from ..train.eval_loop import build_eval_dataset
    from ..train.loop import build_train_dataset
    datasets = ([build_eval_dataset(cfg)] if args.eval
                else [build_train_dataset(cfg)])
    for ds in datasets:
        n = len(ds)
        print(f"building cache for {n} samples")

        def one(i):
            try:
                ds[i]
                return None
            except Exception as e:  # keep building; report at the end
                return (i, repr(e))

        with ThreadPoolExecutor(max_workers=args.workers) as ex:
            errors = [r for r in ex.map(one, range(n)) if r is not None]
        print(f"done; {len(errors)} failures")
        for i, e in errors[:20]:
            print(f"  sample {i}: {e}")


if __name__ == "__main__":
    main()
