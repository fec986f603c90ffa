"""Synthetic BOP fixture — thin wrapper over pose6d_tpu.data.synth."""
from __future__ import annotations

from pose6d_tpu.data.synth import (FX, FY, CX, CY, W, H,  # noqa: F401
                                   rasterize_depth)
from pose6d_tpu.data.synth import write_bop_scene as _write_scene


def write_bop_scene(root, name, mesh, obj_id, R, t_mm, diameter_mm,
                    n_frames: int = 1, mode="train_pbr"):
    return _write_scene(root, name, mesh, obj_id,
                        [(R, t_mm)] * n_frames, diameter_mm, mode=mode)
