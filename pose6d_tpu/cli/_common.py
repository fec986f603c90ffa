from __future__ import annotations

import argparse


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--config", required=True, help="YAML config path")
    p.add_argument("overrides", nargs="*",
                   help="dotted config overrides, e.g. train.lr=1e-3")
    return p


def load(args):
    from .. import runtime
    runtime.configure()
    from ..config import load_config
    return load_config(args.config, args.overrides)
