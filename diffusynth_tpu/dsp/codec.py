"""The "STFT+" codec: complex spectrum <-> 3-channel real encoding.

Channels are (log1p magnitude, cos phase, sin phase), exactly the encoding
the VQ-GAN consumes/produces (reference: tools.py:320-345). Implemented in
jnp so encode/decode fuse into the surrounding XLA program instead of
round-tripping through numpy on the host.

Layout note: the reference stacks channels first (C, F, T). TPU-native code
here is channels-LAST (..., F, T, 3); `channel_axis` lets callers pick.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def encode_stft(D: jnp.ndarray, channel_axis: int = -1) -> jnp.ndarray:
    """Complex spectrum (..., F, T) -> real (..., F, T, 3) (channels last).

    Mirrors the reference's encode_stft (reference: tools.py:320-331).
    """
    magnitude = jnp.abs(D)
    phase = jnp.angle(D)
    log_magnitude = jnp.log1p(magnitude)
    return jnp.stack(
        [log_magnitude, jnp.cos(phase), jnp.sin(phase)], axis=channel_axis
    )


def decode_stft(encoded: jnp.ndarray, channel_axis: int = -1) -> jnp.ndarray:
    """Real 3-channel encoding -> complex spectrum (..., F, T).

    Mirrors the reference's decode_stft (reference: tools.py:334-345),
    including the atan2 phase renormalization (so decoder outputs with
    cos^2 + sin^2 != 1 land on the unit circle).
    """
    log_magnitude = jnp.take(encoded, 0, axis=channel_axis)
    cos_phase = jnp.take(encoded, 1, axis=channel_axis)
    sin_phase = jnp.take(encoded, 2, axis=channel_axis)
    magnitude = jnp.expm1(log_magnitude)
    phase = jnp.arctan2(sin_phase, cos_phase)
    # Build the complex spectrum from cos/sin (complex exp is unimplemented
    # on the TPU backend; this is also exactly the reference formulation).
    return jax.lax.complex(
        magnitude * jnp.cos(phase), magnitude * jnp.sin(phase)
    )
