"""Post-hoc correspondence re-solving (reference scripts/eval_2.py):
reload saved eval results, re-run a fmap2pointmap solver (e.g. to try
the other solver or new thresholds), update p_pred + ir in place.

    python -m pose6d_tpu.cli.resolve <results_dir> --solver naive
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("results_dir")
    p.add_argument("--solver", choices=["naive", "spatial_filtering"],
                   default="spatial_filtering")
    p.add_argument("--topk", type=int, default=5,
                   help="spectral candidates per PC point")
    p.add_argument("--taus", type=float, nargs="+", default=None,
                   help="consistency schedule as diam fractions; last "
                        "two = (tight, loose-fallback) final round")
    args = p.parse_args()
    from .. import runtime
    runtime.configure()
    import jax.numpy as jnp

    from ..ops.masking import pad_to
    from ..solvers import (naive_fmap2pointmap,
                           spatial_filtering_fmap2pointmap)
    from ..train import metrics

    files = sorted(Path(args.results_dir).glob("result_*.npz"))
    irs = []
    for f in files:
        r = dict(np.load(f, allow_pickle=False))
        if "evecs_cad" not in r:
            print(f"{f.name}: no saved bases, skipping")
            continue
        nc = len(r["cad_xyz"])
        npc = len(r["pcd_depth"])
        vc = 512 * ((nc + 511) // 512)
        vp = 512 * ((npc + 511) // 512)
        ex = jnp.asarray(pad_to(r["evecs_cad"], vc))
        ey = jnp.asarray(pad_to(r["evecs_pc"], vp))
        xv = jnp.asarray(np.arange(vc) < nc)
        yv = jnp.asarray(np.arange(vp) < npc)
        C = jnp.asarray(r["C_pred"])
        if args.solver == "naive":
            pairs, valid = naive_fmap2pointmap(C, ex, ey, xv, yv)
        else:
            kw = {"k": args.topk}
            if args.taus:
                kw["taus"] = tuple(args.taus)
            pairs, valid = spatial_filtering_fmap2pointmap(
                C, ex, ey, jnp.asarray(pad_to(r["cad_xyz"], vc)),
                jnp.asarray(pad_to(r["pcd_depth"], vp)), xv, yv,
                float(r["diam_cad"]), **kw)
        ir = float(metrics.inlier_ratio(
            pairs, valid, jnp.asarray(pad_to(r["cad_xyz"], vc)),
            jnp.asarray(pad_to(r["align_pc"], vp)),
            0.1 * float(r["diam_cad"])))
        pv = np.asarray(valid)
        r["p_pred"] = np.asarray(pairs)[:, pv].T
        r["ir"] = ir
        np.savez(f, **r)
        irs.append(ir)
        print(f"{f.name}: ir={ir:.4f} pairs={pv.sum()}")
    if irs:
        print(f"mean IR: {np.mean(irs):.4f}")


if __name__ == "__main__":
    main()
