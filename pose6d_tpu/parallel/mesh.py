"""Device mesh + SPMD sharding for data-parallel training and eval.

The reference is single-process single-GPU (its only distributed
artifacts are dead DDP imports, reference scripts/eval_2.py:22-26;
SURVEY §2.4). Here multi-chip is first-class and TPU-native: a 1-D
jax.sharding.Mesh over the data axis, batches sharded on their leading
axis, parameters replicated, and the jitted train step compiled under
GSPMD so XLA inserts the gradient all-reduce (psum) over ICI — no NCCL
analog, no manual collectives.

The 24k-parameter model needs no tensor/pipeline sharding (SURVEY §2.4);
the mesh layout keeps a model axis trivially addable (Mesh shape
(data, 1)) if wider models ever appear.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Put a host batch on device, sharded along the leading (batch) axis."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.device_put(batch, sharding)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def make_parallel_train_step(step_fn, mesh: Mesh, axis_name: str = "data"):
    """Compile step_fn(state, batch, key) with batch sharded over the mesh.

    Parameters/optimizer state are replicated; the global-batch loss mean
    makes XLA emit a psum over the data axis for the gradients.
    """
    batch_sh = NamedSharding(mesh, P(axis_name))
    rep = NamedSharding(mesh, P())
    return jax.jit(step_fn,
                   in_shardings=(rep, batch_sh, rep),
                   out_shardings=(rep, rep))


def make_parallel_forward(fwd_fn, mesh: Mesh, axis_name: str = "data"):
    """Compile fwd_fn(params, batch) with the batch sharded for eval."""
    batch_sh = NamedSharding(mesh, P(axis_name))
    rep = NamedSharding(mesh, P())
    return jax.jit(fwd_fn, in_shardings=(rep, batch_sh),
                   out_shardings=batch_sh)
