from __future__ import annotations

import argparse


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--config", required=True, help="YAML config path")
    p.add_argument("overrides", nargs="*",
                   help="dotted config overrides, e.g. train.lr=1e-3")
    return p


def add_multihost_args(p: argparse.ArgumentParser) -> None:
    """DCN bring-up flags (SURVEY §2.4 multi-host plan)."""
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0; enables jax.distributed "
                        "multi-host mode (frame-sharded eval / DP train)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)


def load(args):
    # distributed bring-up must precede ANY backend-touching JAX call
    if getattr(args, "coordinator", None):
        from ..parallel import init_multihost
        init_multihost(args.coordinator, args.num_processes,
                       args.process_id)
    from .. import runtime
    runtime.configure()
    from ..config import load_config
    return load_config(args.config, args.overrides)
