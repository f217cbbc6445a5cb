"""Serving metrics registry: counters, latency quantiles, batch histogram.

The reference has no serving layer at all (gradio demo.launch only,
reference app.py:91); this gives the production HTTP API observability:
per-endpoint request counts/latency percentiles, micro-batcher batch-size
histogram and queue-wait, device dispatch counters. Snapshot via
GET /v1/metrics.
"""

from __future__ import annotations

import threading
import time
from collections import defaultdict, deque
from typing import Any, Dict


class _Latency:
    """Fixed-size reservoir of recent latencies (seconds)."""

    def __init__(self, maxlen: int = 512):
        self.samples: deque = deque(maxlen=maxlen)
        self.count = 0
        self.errors = 0
        self.total = 0.0

    def record(self, seconds: float, error: bool = False):
        self.samples.append(seconds)
        self.count += 1
        self.total += seconds
        if error:
            self.errors += 1

    def snapshot(self) -> Dict[str, Any]:
        xs = sorted(self.samples)
        q = (lambda p: xs[min(len(xs) - 1, int(p * len(xs)))]) if xs \
            else (lambda p: 0.0)
        return {
            "count": self.count,
            "errors": self.errors,
            "mean_s": (self.total / self.count) if self.count else 0.0,
            "p50_s": q(0.50),
            "p95_s": q(0.95),
            "p99_s": q(0.99),
        }


class Metrics:
    """Thread-safe serving metrics."""

    def __init__(self):
        self._lock = threading.Lock()
        self._endpoints: Dict[str, _Latency] = defaultdict(_Latency)
        self._batch_sizes: Dict[int, int] = defaultdict(int)
        self._queue_wait = _Latency()
        self._started = time.time()

    def time_endpoint(self, name: str):
        """Context manager recording one endpoint invocation."""
        metrics = self

        class _Timer:
            def __enter__(self):
                self.t0 = time.perf_counter()
                self.error = False
                return self

            def __exit__(self, exc_type, exc, tb):
                with metrics._lock:
                    metrics._endpoints[name].record(
                        time.perf_counter() - self.t0,
                        error=exc_type is not None)
                return False

        return _Timer()

    def record_batch(self, merged: int, executed: int, queue_wait_s: float):
        with self._lock:
            self._batch_sizes[executed] += 1
            self._queue_wait.record(queue_wait_s)
            _ = merged

    def snapshot(self) -> Dict[str, Any]:
        with self._lock:
            return {
                "uptime_s": time.time() - self._started,
                "endpoints": {k: v.snapshot()
                              for k, v in self._endpoints.items()},
                "batch_size_histogram": dict(
                    sorted(self._batch_sizes.items())),
                "batch_queue_wait": self._queue_wait.snapshot(),
            }
