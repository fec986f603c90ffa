"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host CPU devices
(xla_force_host_platform_device_count); the driver separately dry-runs
the multi-chip path via __graft_entry__.dryrun_multichip.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys  # noqa: E402

# The tunnel-backed TPU plugin blocks backend init (plugin discovery
# touches every registered plugin) when its tunnel is down, even with
# cpu selected — hide it; this suite is CPU-only by construction.
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]

import jax  # noqa: E402

# This environment pins jax_platforms to "axon,cpu" (TPU plugin) at import,
# overriding the JAX_PLATFORMS env var — force CPU explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# This JAX build defaults matmuls to bf16 passes even on CPU; tests check
# f32 numerics. Model code opts into bf16 explicitly where it wants it.
jax.config.update("jax_default_matmul_precision", "float32")

# Persistent compilation cache: the suite is compile-dominated on the
# 1-CPU host (e2e pose stages alone re-spend ~3 min of XLA time per
# invocation), and the CPU backend honors the cache (verified; the
# tunneled TPU plugin does not). First run pays full compiles;
# subsequent invocations of either suite half reuse them.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("POSE6D_JAX_CACHE",
                                 "/tmp/pose6d_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
