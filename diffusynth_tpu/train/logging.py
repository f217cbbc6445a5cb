"""Metric logging: JSONL always, TensorBoard when available.

The reference logs through torch's SummaryWriter (reference: VQGAN.py:666,
diffusion.py:455); here a thin interface writes JSONL (machine-readable for
the bench harness) and mirrors to TensorBoard if tensorboardX/torch TB is
importable.
"""

from __future__ import annotations

import collections
import json
import os
import time
from typing import Optional


class MetricWindow:
    """Rolling window of per-step scalars (or dicts of scalars) that does
    NOT force a device sync on append.

    `float(loss)` on the scalar a jitted train step just returned blocks
    until the step finishes on device, serializing the loop with the
    host<->device round trip — through the axon tunnel that gap is the
    difference between 54 ms device and ~420 ms wall per b8 diffusion step
    (benchmarks/RESULTS_r2.md config-5 note). Values stay as device arrays
    until a window statistic is requested (logging / checkpoint gating,
    every >=100 steps), then are fetched in ONE batched jax.device_get.
    """

    def __init__(self, maxlen: int):
        self._win: collections.deque = collections.deque(maxlen=maxlen)

    def append(self, value) -> None:
        """value: a device scalar, or a flat dict of device scalars."""
        self._win.append(value)

    def __len__(self) -> int:
        return len(self._win)

    def _fetch(self, tail: int):
        import jax

        return jax.device_get(list(self._win)[-tail:])

    def mean(self, tail: int) -> float:
        """Mean of the last `tail` scalar entries (one batched fetch)."""
        import numpy as np

        window = self._fetch(tail)
        return float(np.mean(np.asarray(window, np.float64)))

    def mean_dict(self, tail: int) -> dict:
        """Per-key means of the last `tail` dict entries."""
        import numpy as np

        window = self._fetch(tail)
        if not window:
            return {}
        return {k: float(np.mean([np.asarray(w[k], np.float64)
                                  for w in window]))
                for k in window[0]}


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
