"""Process-level runtime setup shared by all entry points.

JAX's default matmul precision is bf16 on TPU (and mirrors that on some
CPU builds). The pipeline wants f32 semantics for geometry/linear-algebra
correctness while the model opts into bf16 explicitly for MXU throughput,
so entry points call configure() once at startup.
"""
from __future__ import annotations

import jax


def configure(matmul_precision: str = "float32", enable_x64: bool = False):
    jax.config.update("jax_default_matmul_precision", matmul_precision)
    jax.config.update("jax_enable_x64", enable_x64)


def device_kind() -> str:
    return jax.devices()[0].device_kind
