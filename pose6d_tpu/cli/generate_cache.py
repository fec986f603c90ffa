"""Cache build CLI (reference scripts/generate_cache.py): iterate every
dataset sample once so preprocessing + LBO operators land in the cache.

Process-parallel: the per-frame LBO build is host-bound numpy/scipy
(Delaunay holds the GIL, so threads serialize); each worker process
rebuilds the dataset from the config and owns a disjoint index slice.
Mirrors the reference's `torch.multiprocessing` spawn + num_workers
DataLoader (scripts/generate_cache.py:32-34), without its duplicated
`num_workers =` syntax error.

    python -m pose6d_tpu.cli.generate_cache --config config/lm.yaml
"""
from __future__ import annotations

import os

from ._common import base_parser, load

_DS = None


def _init_worker(cfg, build_eval: bool, platform: str, n_workers: int = 1):
    os.environ.setdefault("JAX_PLATFORMS", platform)
    if n_workers > 1:
        # workers each get one BLAS thread: n_workers processes x
        # default BLAS threads oversubscribes the host and thrashes
        cpus = os.cpu_count() or 1
        per = max(1, cpus // n_workers)
        for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
                    "MKL_NUM_THREADS"):
            os.environ[var] = str(per)
    import jax
    jax.config.update("jax_platforms", platform)
    from .. import runtime
    runtime.configure()
    global _DS
    if build_eval:
        from ..train.eval_loop import build_eval_dataset
        _DS = build_eval_dataset(cfg)
    else:
        from ..train.loop import build_train_dataset
        _DS = build_train_dataset(cfg)


def _build_one(i):
    try:
        _DS[i]
        return None
    except Exception as e:  # keep building; report at the end
        return (i, repr(e))


def main():
    p = base_parser(__doc__)
    p.add_argument("--workers", type=int, default=os.cpu_count() or 4)
    p.add_argument("--eval", action="store_true",
                   help="build the eval dataset cache instead of train")
    p.add_argument("--platform", default="cpu",
                   help="JAX platform for preprocessing ops (cache build "
                        "is host-side work; cpu avoids hogging the chip)")
    p.add_argument("--serial", action="store_true",
                   help="build in-process (debugging)")
    args = p.parse_args()
    cfg = load(args)

    _init_worker(cfg, args.eval, args.platform)
    n = len(_DS)
    print(f"building cache for {n} samples with "
          f"{1 if args.serial else args.workers} workers")
    if args.serial or args.workers <= 1:
        errors = [r for r in map(_build_one, range(n)) if r is not None]
    else:
        import multiprocessing as mp
        from concurrent.futures import ProcessPoolExecutor
        ctx = mp.get_context("spawn")  # never fork a live JAX runtime
        with ProcessPoolExecutor(
                max_workers=min(args.workers, max(n, 1)), mp_context=ctx,
                initializer=_init_worker,
                initargs=(cfg, args.eval, args.platform,
                          args.workers)) as ex:
            errors = [r for r in ex.map(_build_one, range(n), chunksize=1)
                      if r is not None]
    print(f"done; {len(errors)} failures")
    for i, e in errors[:20]:
        print(f"  sample {i}: {e}")


if __name__ == "__main__":
    main()
