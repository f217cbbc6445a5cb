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


class DeviceStuckError(RuntimeError):
    """The in-flight batch has exceeded the stuck threshold — the device is
    presumed wedged (the axon backend's known failure mode: a faulted
    server-side compile blocks every client indefinitely,
    docs/SCAN_FAULT.md). New requests fail fast instead of burning their
    full timeout behind a dead batch."""


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
                 max_batch: int = 16, window_ms: float = 30.0,
                 stuck_after_s: float = 900.0):
        self._run_batch = run_batch
        self.max_batch = max_batch
        self.window_s = window_ms / 1000.0
        # A batch older than this is presumed wedged (first-compile of the
        # big programs can legitimately take minutes through the tunnel,
        # hence the generous default; serving with warmup manifests can
        # set it much lower).
        self.stuck_after_s = stuck_after_s
        self._inflight_since: Optional[float] = None
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        self.batches_run = 0
        self.requests_served = 0
        self.metrics = None  # optional serving.metrics.Metrics

    def inflight_age_s(self) -> float:
        """Seconds the current batch has been executing (0 when idle)."""
        t = self._inflight_since
        return 0.0 if t is None else time.monotonic() - t

    def is_stuck(self) -> bool:
        return self.inflight_age_s() > self.stuck_after_s

    def submit(self, signature: Tuple, payload: Any, timeout: float = 300.0,
               priority: int = 0):
        """Block until the merged batch containing this request completes.
        priority > 0 skips the batching window (latency over throughput).
        Raises DeviceStuckError immediately when the in-flight batch has
        exceeded stuck_after_s, and TimeoutError when this request's own
        wait expires."""
        if self.is_stuck():
            raise DeviceStuckError(
                f"in-flight batch stuck for {self.inflight_age_s():.0f}s "
                f"(> {self.stuck_after_s:.0f}s); refusing new work")
        req = _Request(signature, payload, priority=priority)
        self._queue.put(req)
        if not req.event.wait(timeout):
            raise TimeoutError("generation timed out")
        if req.error is not None:
            raise req.error
        return req.result

    def submit_many(self, signature: Tuple, payloads: List[Any],
                    timeout: float = 300.0, priority: int = 0) -> List[Any]:
        """Submit several rows of ONE logical request (e.g. batchsize-N
        variations) and block until all complete. The rows share the
        signature, so they coalesce with each other (and with concurrent
        requests) into merged launches; one shared deadline covers the
        whole set."""
        if self.is_stuck():
            raise DeviceStuckError(
                f"in-flight batch stuck for {self.inflight_age_s():.0f}s "
                f"(> {self.stuck_after_s:.0f}s); refusing new work")
        reqs = [_Request(signature, p, priority=priority) for p in payloads]
        for req in reqs:
            self._queue.put(req)
        deadline = time.monotonic() + timeout
        for req in reqs:
            if not req.event.wait(max(0.0, deadline - time.monotonic())):
                raise TimeoutError("generation timed out")
        for req in reqs:
            if req.error is not None:
                raise req.error
        return [req.result for req in reqs]

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
            self._inflight_since = now
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
                self._inflight_since = None
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
