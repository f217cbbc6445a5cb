"""Dynamic micro-batching: coalesce concurrent generation requests.

Requests arriving within a batching window that share the same static
program signature (width bucket, steps, CFG, sampler) are executed as ONE
batched sampler launch - batch-64 costs ~the same wall-clock as batch-8 on
the MXU, so coalescing converts concurrency into nearly-free throughput.
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple


@dataclass
class _Request:
    signature: Tuple            # static program signature (must batch equal)
    payload: Any                # per-request data (prompt, seed, ...)
    event: threading.Event = field(default_factory=threading.Event)
    result: Any = None
    error: Optional[Exception] = None
    priority: int = 0           # >0: skip the batching window (low latency)
    enqueued_at: float = field(default_factory=time.monotonic)


class MicroBatcher:
    """Background thread that drains a queue and executes merged batches.

    run_batch(signature, payloads) -> list of per-request results.
    """

    def __init__(self, run_batch: Callable[[Tuple, List[Any]], List[Any]],
                 max_batch: int = 16, window_ms: float = 30.0):
        self._run_batch = run_batch
        self.max_batch = max_batch
        self.window_s = window_ms / 1000.0
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        self.batches_run = 0
        self.requests_served = 0
        self.metrics = None  # optional serving.metrics.Metrics

    def submit(self, signature: Tuple, payload: Any, timeout: float = 300.0,
               priority: int = 0):
        """Block until the merged batch containing this request completes.
        priority > 0 skips the batching window (latency over throughput)."""
        req = _Request(signature, payload, priority=priority)
        self._queue.put(req)
        if not req.event.wait(timeout):
            raise TimeoutError("generation timed out")
        if req.error is not None:
            raise req.error
        return req.result

    def _loop(self):
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            window = 0.0 if first.priority > 0 else self.window_s
            deadline = time.monotonic() + window
            # Collect same-signature requests inside the window; requeue the
            # rest for the next round.
            requeue = []
            while len(batch) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    req = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
                if req.signature == first.signature:
                    batch.append(req)
                else:
                    requeue.append(req)
            for req in requeue:
                self._queue.put(req)

            # Queue wait = enqueue -> batch dispatch, captured BEFORE the
            # batch executes (it used to include execution time; advisor
            # finding r1). Averaged over the batch so it isn't just the
            # first request's wait.
            now = time.monotonic()
            queue_wait_s = sum(now - r.enqueued_at for r in batch) / len(batch)
            try:
                results = self._run_batch(
                    first.signature, [r.payload for r in batch])
                assert len(results) == len(batch)
                for req, res in zip(batch, results):
                    req.result = res
            except Exception as e:  # propagate to all waiters
                for req in batch:
                    req.error = e
            finally:
                self.batches_run += 1
                self.requests_served += len(batch)
                if self.metrics is not None:
                    self.metrics.record_batch(
                        merged=len(batch), executed=len(batch),
                        queue_wait_s=queue_wait_s)
                for req in batch:
                    req.event.set()

    def stop(self):
        self._stop.set()
        self._thread.join(timeout=2.0)
