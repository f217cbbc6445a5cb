"""Runtime utilities: profiling/tracing and timing harnesses."""

from diffusynth_tpu.utils.profiling import (
    annotate,
    time_fn,
    trace,
)
