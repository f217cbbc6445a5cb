"""Import environment for running the reference PyTorch code in-process.

The reference at /root/reference imports librosa, torchvision, and its own
missing `metrics.IS` module at import time; none are installed here (by
design — the framework ships its own DSP). This module installs minimal
shims so the reference's model/ and tools.py import, with `librosa.istft`
backed by torch.istft (the framework's STFT oracle throughout tests/) so
the reference's decode tail (webUI/.../utils.py:241) can run for parity
measurements.

Used by the end-to-end fidelity harness (metrics/parity.py) and tests.
"""

from __future__ import annotations

import sys
import types

REFERENCE = "/root/reference"


def setup_reference_imports(reference_dir: str = REFERENCE) -> None:
    if reference_dir not in sys.path:
        sys.path.insert(0, reference_dir)

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_models = types.ModuleType("torchvision.models")

        def _no_resnet(*a, **k):
            raise RuntimeError("torchvision stub: discriminator not used")

        tv_models.resnet18 = _no_resnet
        tv.models = tv_models
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv_models

    lib = sys.modules.get("librosa")
    if lib is None:
        lib = types.ModuleType("librosa")
        sys.modules["librosa"] = lib
    if not hasattr(lib, "istft"):
        lib.istft = _istft_torch

    if "metrics" not in sys.modules:
        metrics_pkg = types.ModuleType("metrics")
        metrics_is = types.ModuleType("metrics.IS")
        metrics_is.get_inception_score = lambda *a, **k: 0.0
        metrics_pkg.IS = metrics_is
        sys.modules["metrics"] = metrics_pkg
        sys.modules["metrics.IS"] = metrics_is


def _istft_torch(stft_matrix, hop_length=None, win_length=None,
                 window="hann", center=True, length=None):
    """librosa.istft drop-in backed by torch.istft (hann/center only —
    the parameters the reference uses, utils.py:241)."""
    import numpy as np
    import torch

    assert window == "hann", window
    D = torch.from_numpy(np.ascontiguousarray(stft_matrix)).to(torch.complex64)
    n_fft = 2 * (D.shape[-2] - 1)
    win_length = win_length or n_fft
    hop_length = hop_length or win_length // 4
    out = torch.istft(
        D, n_fft=n_fft, hop_length=hop_length, win_length=win_length,
        window=torch.hann_window(win_length), center=center, length=length,
    )
    return out.numpy()
