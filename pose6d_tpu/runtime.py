"""Process-level runtime setup shared by all entry points.

JAX's default matmul precision is bf16 on TPU (and mirrors that on some
CPU builds). The pipeline wants f32 semantics for geometry/linear-algebra
correctness while the model opts into bf16 explicitly for MXU throughput,
so entry points call configure() once at startup.
"""
from __future__ import annotations

import jax


def configure(matmul_precision: str = "float32", enable_x64: bool = False,
              compilation_cache_dir: str | None = "/tmp/jax_comp_cache"):
    jax.config.update("jax_default_matmul_precision", matmul_precision)
    jax.config.update("jax_enable_x64", enable_x64)
    if compilation_cache_dir:
        # Persistent XLA compilation cache: short-lived processes (cache
        # builders, CLI sweeps, chained training windows) stop re-paying
        # the same multi-minute compiles on every launch.
        jax.config.update("jax_compilation_cache_dir", compilation_cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def device_kind() -> str:
    return jax.devices()[0].device_kind
