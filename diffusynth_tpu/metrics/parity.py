"""Output-fidelity harness: spectrogram MAE between two pipelines.

BASELINE.md's fidelity target is spectrogram MAE < 1e-3 vs the PyTorch
reference given identical weights and inputs; this module provides the
measurement used by the parity tests and (once converted reference weights
are available) the cross-framework check.
"""

from __future__ import annotations

import numpy as np


def spectrogram_mae(a: np.ndarray, b: np.ndarray) -> float:
    """Mean absolute error between two STFT+ encodings (any matching shape)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    assert a.shape == b.shape, (a.shape, b.shape)
    return float(np.mean(np.abs(a - b)))
