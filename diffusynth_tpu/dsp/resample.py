"""Windowed-sinc resampling and length adjustment in pure JAX.

TPU-native replacement for librosa.core.resample (reference: tools.py:141)
and adjust_audio_length (reference: tools.py:126-151). The resampler is a
gather + weighted-sum with a Hann-windowed sinc kernel (anti-aliased on
downsampling), fully static-shaped so it jits once per (in_len, ratio).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("orig_sr", "target_sr", "zeros"))
def resample(
    x: jnp.ndarray, orig_sr: float, target_sr: float, zeros: int = 24
) -> jnp.ndarray:
    """Resample (..., n) from orig_sr to target_sr.

    Uses a Hann-windowed sinc interpolation kernel with cutoff at the lower
    of the two Nyquist frequencies (anti-aliasing on downsample).
    """
    if orig_sr == target_sr:
        return x
    n_in = x.shape[-1]
    ratio = float(target_sr) / float(orig_sr)
    n_out = int(np.ceil(n_in * ratio))

    cutoff = min(1.0, ratio)                 # in units of input Nyquist
    half_width = int(np.ceil(zeros / cutoff))

    # Output sample positions in input-sample units (host constants).
    positions = np.arange(n_out) / ratio
    base = np.floor(positions).astype(np.int64)
    frac = (positions - base).astype(np.float32)

    offsets = np.arange(-half_width, half_width + 1)
    idx = base[:, None] + offsets[None, :]                  # (n_out, taps)
    idx_clipped = np.clip(idx, 0, n_in - 1)
    valid = (idx >= 0) & (idx < n_in)

    # Windowed-sinc weights around each fractional position.
    t = (offsets[None, :] - frac[:, None]).astype(np.float64)  # (n_out, taps)
    sinc = np.sinc(cutoff * t)
    window = 0.5 * (1.0 + np.cos(np.pi * t / (half_width + 1)))
    window = np.where(np.abs(t) <= half_width + 1, window, 0.0)
    weights = (cutoff * sinc * window * valid).astype(np.float32)

    gathered = x[..., jnp.asarray(idx_clipped)]             # (..., n_out, taps)
    return jnp.einsum("...ot,ot->...o", gathered, jnp.asarray(weights))


def adjust_audio_length(
    audio: jnp.ndarray,
    desired_length: int,
    original_sample_rate: int,
    target_sample_rate: int,
) -> jnp.ndarray:
    """Resample to the target rate, then crop or zero-pad to desired_length.

    Mirrors the reference's adjust_audio_length (reference: tools.py:126-151).
    """
    if original_sample_rate != target_sample_rate:
        audio = resample(audio, original_sample_rate, target_sample_rate)
    n = audio.shape[-1]
    if n > desired_length:
        return audio[..., :desired_length]
    if n < desired_length:
        pad_widths = [(0, 0)] * (audio.ndim - 1) + [(0, desired_length - n)]
        return jnp.pad(audio, pad_widths)
    return audio
