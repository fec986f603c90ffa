"""Checkpointing: full TrainState (params + optimizer + step).

The reference saves bare model weights every checkpoint_interval epochs
and cannot resume the optimizer (scripts/train.py:135-136, SURVEY §5).
Here the whole TrainState serializes via flax msgpack; restore rebuilds
onto a template state so shapes/dtypes are validated. Keeps the last K
checkpoints.
"""
from __future__ import annotations

import json
from pathlib import Path

from flax import serialization


def save_checkpoint(ckpt_dir, state, step: int, keep: int = 5):
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    path = ckpt_dir / f"ckpt_{step:08d}.msgpack"
    path.write_bytes(serialization.to_bytes(state))
    (ckpt_dir / "latest.json").write_text(json.dumps({"step": step}))
    ckpts = sorted(ckpt_dir.glob("ckpt_*.msgpack"))
    for old in ckpts[:-keep]:
        old.unlink()
    return path


def latest_checkpoint(ckpt_dir):
    ckpt_dir = Path(ckpt_dir)
    meta = ckpt_dir / "latest.json"
    if not meta.exists():
        return None
    step = json.loads(meta.read_text())["step"]
    path = ckpt_dir / f"ckpt_{step:08d}.msgpack"
    return path if path.exists() else None


def restore_checkpoint(path, template_state):
    data = Path(path).read_bytes()
    return serialization.from_bytes(template_state, data)


def save_params(path, params):
    """Weights-only export (interop with eval / the reference flow)."""
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_bytes(serialization.to_bytes(params))


def load_params(path, template_params):
    return serialization.from_bytes(template_params,
                                    Path(path).read_bytes())
