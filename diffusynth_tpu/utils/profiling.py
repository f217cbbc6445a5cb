"""Profiling and timing: jax.profiler annotations + a wall-clock harness.

The reference has no tracing at all (SURVEY.md section 5 - only tqdm bars);
here every pipeline stage can be annotated for the XLA profiler and the
benchmark CLI uses the same timing harness as bench.py.

Usage:
    with trace("/tmp/jax-trace"):          # writes a TensorBoard trace
        with annotate("text2sound"):
            pipe(...)

    stats = time_fn(lambda: pipe(...), iters=5)   # {"p50": ..., "mean": ...}
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional

import jax
import numpy as np


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the device trace (jax.profiler.TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _leaves(x):
    """Array leaves of x, looking inside plain dataclasses too.

    Pipeline results (Text2SoundResult etc.) are ordinary dataclasses, NOT
    registered pytrees — jax.tree_util.tree_leaves returns the dataclass
    itself as one opaque leaf, so a timer that only walked the pytree
    never synced with the device and measured dispatch-only wall clock
    (caught 2026-08-18: harness config 2 reported an impossible
    176 timbres/s)."""
    import dataclasses

    if dataclasses.is_dataclass(x) and not isinstance(x, type):
        return [v for f in dataclasses.fields(x)
                for v in _leaves(getattr(x, f.name))]
    return jax.tree_util.tree_leaves(x)


def _block(result):
    """block_until_ready on every array leaf of a result (pytree or
    dataclass-of-arrays)."""
    for leaf in _leaves(result):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
    return result


def time_fn(fn: Callable[[], Any], iters: int = 5, warmup: int = 1) -> Dict[str, float]:
    """Wall-clock stats for a device computation (compile excluded by the
    warmup runs; results blocked until ready)."""
    for _ in range(warmup):
        _block(fn())
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _block(fn())
        times.append(time.perf_counter() - t0)
    arr = np.asarray(times)
    return {
        "p50": float(np.median(arr)),
        "mean": float(arr.mean()),
        "min": float(arr.min()),
        "max": float(arr.max()),
        "iters": iters,
    }
