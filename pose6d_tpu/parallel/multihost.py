"""Multi-host (DCN) eval sharding: process-sharded frame lists.

SURVEY §2.4/§5 names the TPU-native plan for scaling eval beyond one
host: shard the *frame list* across processes over DCN (each host owns
a contiguous stride of frames and its local chips), run the standard
jitted pipeline on the local mesh, and aggregate per-object metrics
with a cheap cross-host psum at the end. Model forward + solvers need
no cross-host communication — frames are independent — so DCN carries
only the init handshake and the final scalar reductions, exactly what
slow inter-host links are good for; everything bandwidth-hungry rides
ICI inside each host's mesh.

Single-host environments (this repo's CI and the driver) exercise the
same code path: jax.process_index()/process_count() are 0/1, the frame
partition is the identity, and the psum aggregation degenerates to a
local sum. The partitioning + aggregation logic is pure and unit-tested
(tests/test_train.py); the jax.distributed.initialize call is the only
line that needs real DCN.
"""
from __future__ import annotations

import jax
import numpy as np


def init_multihost(coordinator: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> None:
    """Bring up JAX distributed over DCN. No-op when already initialized
    or when running single-process (the common local case).

    MUST run before anything touches the XLA backend: even
    jax.process_count() initializes it, after which
    jax.distributed.initialize raises unconditionally — so the
    already-initialized check reads the distributed client state
    directly instead of calling a backend-touching API.
    """
    if coordinator is None:
        return
    from jax._src import distributed as _dist
    if getattr(_dist.global_state, "client", None) is not None:
        return  # distributed runtime already up
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def shard_frame_list(n_frames: int, process_index: int | None = None,
                     process_count: int | None = None) -> np.ndarray:
    """Strided partition of frame indices for this host.

    Strided (rather than contiguous blocks) so BOP scene ordering —
    which correlates with object id and scene difficulty — spreads
    evenly across hosts and the slowest host is not handed all the
    dense scenes.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return np.arange(pi, n_frames, pc)


def allreduce_metric_sums(local_sums: dict[str, np.ndarray]) -> dict:
    """Sum per-object metric accumulators across hosts.

    local_sums maps metric name -> array (e.g. per-object IR sums and
    counts). Uses a replicated-jit psum over all devices, which rides
    ICI within a host and DCN across hosts; single-process it is an
    identity. Values must be per-HOST sums (call once, on every host).
    """
    if jax.process_count() == 1:
        return {k: np.asarray(v) for k, v in local_sums.items()}
    from jax.experimental import multihost_utils
    stacked = {k: np.asarray(v, np.float32) for k, v in local_sums.items()}
    summed = multihost_utils.process_allgather(stacked)
    return {k: np.sum(v, axis=0) for k, v in summed.items()}
