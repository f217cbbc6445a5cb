"""True device-time measurement via jax.profiler xplane traces.

Host wall-clock through the axon tunnel is unreliable at ms scale (async
dispatch + per-call tunnel latency), so kernels are timed by capturing a
profiler trace around K executions and summing the TPU device-plane event
durations. Validated against a known-FLOPs matmul (see __main__).

Usage:
    from benchmarks.device_time import device_time_ms
    ms = device_time_ms(lambda: f(x), iters=10)   # per-iteration device ms
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
from typing import Callable, Dict, Optional, Tuple

import jax


def _load_xplanes(log_dir: str):
    from benchmarks.xplane import parse_xspace

    paths = glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"),
                      recursive=True)
    planes = []
    for p in paths:
        planes.extend(parse_xspace(p))
    return planes


def _device_busy_ns(planes) -> Tuple[float, Dict[str, float]]:
    """Total busy nanoseconds on TPU device planes (the 'XLA Modules' line —
    one event per executed program) plus a per-op breakdown from the
    'XLA Ops' line (async-copy lines overlap compute and would overcount)."""
    total = 0.0
    by_op: Dict[str, float] = {}
    for plane in planes:
        name = plane.name
        if not ("/device:TPU" in name or name.startswith("TPU")):
            continue
        for line in plane.lines:
            if line.name == "XLA Modules":
                total += sum(ev.duration_ps for ev in line.events) / 1e3
            elif line.name == "XLA Ops":
                for ev in line.events:
                    opname = plane.event_names.get(ev.metadata_id, "?")
                    by_op[opname] = by_op.get(opname, 0.0) \
                        + ev.duration_ps / 1e3
    return total, by_op


def device_time_ms(fn: Callable[[], object], iters: int = 10,
                   warmup: int = 2, breakdown: bool = False,
                   log_dir: Optional[str] = None):
    """Device milliseconds per iteration of fn (compile excluded)."""
    for _ in range(warmup):
        r = fn()
        for leaf in jax.tree_util.tree_leaves(r):
            if hasattr(leaf, "block_until_ready"):
                leaf.block_until_ready()
    tmp = log_dir or tempfile.mkdtemp(prefix="jaxtrace_")
    jax.profiler.start_trace(tmp)
    try:
        results = [fn() for _ in range(iters)]
        for r in results:
            for leaf in jax.tree_util.tree_leaves(r):
                if hasattr(leaf, "block_until_ready"):
                    leaf.block_until_ready()
    finally:
        jax.profiler.stop_trace()
    spaces = _load_xplanes(tmp)
    total_ns, by_op = _device_busy_ns(spaces)
    if log_dir is None:
        shutil.rmtree(tmp, ignore_errors=True)
    ms = total_ns / 1e6 / iters
    if breakdown:
        top = sorted(by_op.items(), key=lambda kv: -kv[1])
        return ms, [(k, v / 1e6 / iters) for k, v in top]
    return ms


if __name__ == "__main__":
    import jax.numpy as jnp
    import numpy as np

    # Calibration: (8192 x 8192) @ (8192 x 8192) bf16 = 1.1 TFLOP.
    # At v5e peak 197 TFLOP/s expect >= ~5.6 ms.
    n = 8192
    a = jnp.ones((n, n), jnp.bfloat16)
    b = jnp.ones((n, n), jnp.bfloat16)
    mm = jax.jit(lambda a, b: a @ b)
    ms, top = device_time_ms(lambda: mm(a, b), iters=10, breakdown=True)
    flops = 2 * n**3
    print(f"matmul device time: {ms:.3f} ms  -> {flops/ms*1e3/1e12:.1f} TFLOP/s")
    for name, t in top[:5]:
        print(f"  {t:8.3f} ms  {name}")
