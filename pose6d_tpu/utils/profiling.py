"""Profiling/observability helpers (SURVEY §5: the reference has none
beyond wall-clock prints; here: jax.profiler traces + stage timers).

    with profile_trace("/tmp/trace"):          # open in Perfetto/XProf
        run_step(...)

    timer = StageTimer()
    with timer("forward"):
        out = fwd(batch)
    print(timer.summary())
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Wall-clock stage timing with device sync at boundaries."""

    def __init__(self):
        self.times = defaultdict(list)

    @contextlib.contextmanager
    def __call__(self, name: str, sync_value=None):
        t0 = time.perf_counter()
        yield
        if sync_value is not None:
            jax.block_until_ready(sync_value)
        self.times[name].append(time.perf_counter() - t0)

    def summary(self) -> dict:
        return {k: {"mean_ms": 1e3 * sum(v) / len(v), "n": len(v)}
                for k, v in self.times.items()}
