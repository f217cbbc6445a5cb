"""Metric logging: JSONL always, TensorBoard when available.

The reference logs through torch's SummaryWriter (reference: VQGAN.py:666,
diffusion.py:455); here a thin interface writes JSONL (machine-readable for
the bench harness) and mirrors to TensorBoard if tensorboardX/torch TB is
importable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricLogger:
    def __init__(self, run_dir: str, use_tensorboard: bool = True):
        self.run_dir = run_dir
        os.makedirs(run_dir, exist_ok=True)
        self._jsonl = open(os.path.join(run_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(run_dir)
            except Exception:
                self._tb = None

    def log(self, name: str, value: float, step: int):
        rec = {"ts": time.time(), "name": name, "value": value, "step": step}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(name, value, step)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
