"""ADSR envelope and RMS normalization (jnp, vmappable).

Mirrors the reference's adsr_envelope / rms_normalize (reference:
tools.py:267-317) with static phase lengths so the envelope constant-folds.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def adsr_envelope(
    signal: jnp.ndarray,
    sample_rate: int,
    duration: float,
    attack_time: float,
    decay_time: float,
    sustain_level: float,
    release_time: float,
) -> jnp.ndarray:
    """Apply an ADSR envelope; output length is duration + 1s of release room.

    Phase layout matches the reference (reference: tools.py:267-309): linear
    attack/decay ramps, constant sustain, linear release inside a fixed 1s
    tail window.
    """
    assert release_time <= 1.0, "release_time > 1.0"
    duration_samples = int(duration * sample_rate)
    attack_samples = int(attack_time * sample_rate)
    decay_samples = int(decay_time * sample_rate)
    release_samples = int(release_time * sample_rate)
    sustain_samples = max(0, duration_samples - attack_samples - decay_samples)

    attack_env = np.linspace(0.0, 1.0, attack_samples)
    decay_env = np.linspace(1.0, sustain_level, decay_samples)
    sustain_env = np.full(sustain_samples, sustain_level)
    release_env = np.zeros(int(1.0 * sample_rate))
    release_env[:release_samples] = np.linspace(sustain_level, 0.0, release_samples)
    envelope = jnp.asarray(
        np.concatenate([attack_env, decay_env, sustain_env, release_env]),
        dtype=jnp.float32,
    )

    n_env = envelope.shape[-1]
    n_sig = signal.shape[-1]
    if n_env <= n_sig:
        return signal[..., :n_env] * envelope
    pad_widths = [(0, 0)] * (signal.ndim - 1) + [(0, n_env - n_sig)]
    return jnp.pad(signal, pad_widths) * envelope


def rms_normalize(audio: jnp.ndarray, target_rms: float = 0.1) -> jnp.ndarray:
    """Scale audio so its RMS equals target_rms (reference: tools.py:312-317)."""
    current_rms = jnp.sqrt(jnp.mean(jnp.square(audio), axis=-1, keepdims=True))
    return audio * (target_rms / current_rms)
