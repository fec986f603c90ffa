"""Training observability: JSONL scalar logs + optional TensorBoard.

Equivalent of the reference's TensorboardLogger (scripts/train.py:25-47)
with per-step and per-epoch-mean scalars. JSONL is the always-on sink
(inspectable anywhere); TensorBoard event files are written too when a
writer is available.
"""
from __future__ import annotations

import json
import time
from datetime import datetime
from pathlib import Path

import numpy as np


class MetricsLogger:
    def __init__(self, log_dir, comment: str = "", run_dir=None):
        if run_dir is not None:
            self.dir = Path(run_dir)
        else:
            stamp = datetime.now().strftime("%b%d_%H-%M-%S")
            self.dir = Path(log_dir) / (
                stamp + ("_" + comment if comment else ""))
        self.dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.dir / "metrics.jsonl", "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(str(self.dir))
        except Exception:
            pass
        self.step = 0

    def log(self, scalars: dict, step: int | None = None):
        step = self.step if step is None else step
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), step)
        self.step = step + 1

    def log_epoch(self, records: list[dict], epoch: int):
        if not records:
            return
        means = {k + "_epoch": float(np.mean([r[k] for r in records]))
                 for k in records[0]}
        rec = {"epoch": epoch, "time": time.time()}
        rec.update(means)
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in means.items():
                self._tb.add_scalar(k, v, epoch)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
