"""Multi-host integration: two real processes over jax.distributed.

Exercises the full DCN bring-up path end to end on localhost — the
ADVICE-r2 finding was that init_multihost could never succeed because it
touched the XLA backend before jax.distributed.initialize; this test
would have caught it. Each process takes its strided shard of a frame
list and the per-object sums are allreduced across processes
(parallel/multihost.py, consumed by train/eval_loop.py).
"""
import os
import socket
import subprocess
import sys

import numpy as np

WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from pose6d_tpu.parallel import (init_multihost, shard_frame_list,
                                 allreduce_metric_sums)
init_multihost(sys.argv[1], num_processes=2, process_id=int(sys.argv[2]))
assert jax.process_count() == 2
import numpy as np
idx = shard_frame_list(10)
local = np.zeros(3, np.float64)
local[0] = len(idx)            # frame count
local[1] = float(idx.sum())    # shard content checksum
local[2] = jax.process_index()
agg = allreduce_metric_sums({"v": local})
# strided partition of range(10) over 2 hosts: 5+5 frames, sum 45
assert agg["v"][0] == 10, agg
assert agg["v"][1] == 45, agg
assert agg["v"][2] == 1, agg   # process ids 0+1
print("MULTIHOST_OK", jax.process_index(), sorted(idx.tolist()))
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_shard_and_allreduce():
    port = _free_port()
    addr = f"localhost:{port}"
    env = os.environ.copy()
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # no virtual-device forcing in workers
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, "-c", WORKER, addr, str(pid)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in (0, 1)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert "MULTIHOST_OK" in out
    # the two shards are disjoint and cover range(10)
    shards = [eval(o.split("MULTIHOST_OK")[1].split("\n")[0].split(" ", 2)[2])
              for o in outs]
    assert sorted(shards[0] + shards[1]) == list(range(10))
    assert not set(shards[0]) & set(shards[1])
