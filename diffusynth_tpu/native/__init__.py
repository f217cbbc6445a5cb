"""Native (C++) host-side audio runtime, loaded via ctypes.

Falls back to numpy implementations when the shared library has not been
built (`make -C native`); `AVAILABLE` reports which path is active.
"""

from diffusynth_tpu.native.audio import (
    AVAILABLE,
    mixdown,
    peak_normalize,
    rms_normalize_batch,
    read_wav,
    sum_tracks,
    write_wav,
)
