"""Training CLI (reference scripts/train.py).

    python -m pose6d_tpu.cli.train --config config/lm.yaml [train.lr=1e-3]
"""
from __future__ import annotations

from ._common import add_multihost_args, base_parser, load


def main():
    p = base_parser(__doc__)
    add_multihost_args(p)
    args = p.parse_args()
    cfg = load(args)
    from ..train.loop import train
    train(cfg)


if __name__ == "__main__":
    main()
