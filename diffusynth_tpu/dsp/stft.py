"""Short-time Fourier transform in pure JAX.

Replaces the reference's librosa.stft / librosa.istft call sites
(reference: sound2sound_with_text.py:85, webUI/.../utils.py:184,241,260,
tools.py:170-191) with framed rfft / windowed overlap-add that jit-compiles
onto the TPU. Semantics match librosa: centered frames, periodic Hann window,
constant zero padding.

Layout: spectra are (..., freq_bins, n_frames) to match the reference's
(freq, time) convention used throughout the codec and models.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _hann_np(win_length: int) -> np.ndarray:
    n = np.arange(win_length)
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))


def hann_window(win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window (matches scipy.signal.get_window('hann', N))."""
    return jnp.asarray(_hann_np(win_length), dtype=dtype)


def _padded_window_np(win_length: int, n_fft: int) -> np.ndarray:
    """Hann window zero-padded (centered) to n_fft, librosa-style (numpy)."""
    w = _hann_np(win_length)
    if win_length == n_fft:
        return w
    lpad = (n_fft - win_length) // 2
    return np.pad(w, (lpad, n_fft - win_length - lpad))


def _padded_window(win_length: int, n_fft: int, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.asarray(_padded_window_np(win_length, n_fft), dtype=dtype)


def num_frames(n_samples: int, hop_length: int) -> int:
    """Number of STFT frames for a centered transform."""
    return 1 + n_samples // hop_length


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length", "pad_mode"))
def stft(
    y: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    pad_mode: str = "constant",
) -> jnp.ndarray:
    """Centered STFT of a (possibly batched) signal.

    Args:
        y: real signal, shape (..., n_samples).
    Returns:
        complex spectrogram, shape (..., 1 + n_fft // 2, n_frames).
    """
    *batch, n = y.shape
    pad = n_fft // 2
    pad_widths = [(0, 0)] * len(batch) + [(pad, pad)]
    y_padded = jnp.pad(y, pad_widths, mode=pad_mode)

    n_frames = 1 + n // hop_length
    # Gather strided frames: (..., n_frames, n_fft).
    frame_idx = (
        np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    )
    frames = y_padded[..., frame_idx]
    window = _padded_window(win_length, n_fft, y.dtype)
    spec = jnp.fft.rfft(frames * window, n=n_fft, axis=-1)
    # (..., n_frames, bins) -> (..., bins, n_frames)
    return jnp.swapaxes(spec, -1, -2)


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "win_length", "length"),
)
def istft(
    spec: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    length: Optional[int] = None,
) -> jnp.ndarray:
    """Inverse STFT by windowed overlap-add with NOLA normalization.

    Args:
        spec: complex spectrogram, shape (..., 1 + n_fft // 2, n_frames).
        length: if given, output is cropped/padded to exactly this many
            samples; otherwise the full (n_frames - 1) * hop_length samples.
    Returns:
        real signal, shape (..., length).
    """
    *batch, n_bins, n_frames = spec.shape
    del n_bins
    window = _padded_window(win_length, n_fft, jnp.float32)

    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1)
    frames = frames * window  # synthesis window

    expected_len = n_fft + hop_length * (n_frames - 1)
    # Overlap-add via scatter-add on a zero buffer.
    frame_idx = (
        np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    ).reshape(-1)
    flat = frames.reshape(*batch, -1)
    out = jnp.zeros((*batch, expected_len), dtype=frames.dtype)
    out = out.at[..., frame_idx].add(flat)

    # Window-squared overlap normalization (host-precomputed, constant-folded).
    wsq = _padded_window_np(win_length, n_fft) ** 2
    norm = np.zeros(expected_len, dtype=np.float64)
    for i in range(n_frames):
        norm[i * hop_length : i * hop_length + n_fft] += wsq
    norm = np.where(norm > 1e-11, norm, 1.0)
    out = out / jnp.asarray(norm, dtype=frames.dtype)

    pad = n_fft // 2
    out = out[..., pad : expected_len - pad]
    if length is not None:
        cur = out.shape[-1]
        if cur > length:
            out = out[..., :length]
        elif cur < length:
            pad_widths = [(0, 0)] * len(batch) + [(0, length - cur)]
            out = jnp.pad(out, pad_widths)
    return out


def pad_stft(D: jnp.ndarray, time_resolution: Optional[int] = 256) -> jnp.ndarray:
    """Drop the DC bin and zero-pad frames to `time_resolution`.

    Mirrors the reference's pad_STFT (reference: tools.py:170-182): the
    513-bin spectrum becomes 512 bins; frames pad (never crop) to the target.
    Works on (..., bins, frames).
    """
    D = D[..., 1:, :]
    if time_resolution is None:
        return D
    padding = time_resolution - D.shape[-1]
    if padding > 0:
        pad_widths = [(0, 0)] * (D.ndim - 1) + [(0, padding)]
        return jnp.pad(D, pad_widths)
    return D


def depad_stft(D_padded: jnp.ndarray) -> jnp.ndarray:
    """Restore the zero DC row (inverse of pad_stft's bin drop).

    Mirrors the reference's depad_STFT (reference: tools.py:185-191).
    """
    pad_widths = [(0, 0)] * (D_padded.ndim - 2) + [(1, 0), (0, 0)]
    return jnp.pad(D_padded, pad_widths)
