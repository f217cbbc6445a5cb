"""Griffin-Lim phase reconstruction as a jitted lax.scan.

TPU-native replacement for librosa.griffinlim (reference: tools.py:75,214,222),
including librosa's momentum acceleration (fast Griffin-Lim, momentum 0.99).
Fixed iteration count -> a single static XLA loop; batches via leading dims.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from diffusynth_tpu.dsp.stft import istft, stft


@functools.partial(
    jax.jit,
    static_argnames=("n_iter", "hop_length", "win_length", "length"),
)
def griffin_lim(
    magnitude: jnp.ndarray,
    key: jax.Array,
    n_iter: int = 32,
    hop_length: int = 256,
    win_length: int = 1024,
    momentum: float = 0.99,
    length: int | None = None,
) -> jnp.ndarray:
    """Reconstruct a waveform from an STFT magnitude.

    Args:
        magnitude: (..., 1 + n_fft // 2, n_frames) non-negative magnitudes.
        key: PRNG key for the random initial phase (the reference relies on
            numpy global RNG; here the seed is explicit).
    Returns:
        real signal (..., n_samples).
    """
    n_fft = 2 * (magnitude.shape[-2] - 1)

    init_phase = jax.random.uniform(
        key, magnitude.shape, minval=-jnp.pi, maxval=jnp.pi
    )
    # lax.complex instead of complex exp (unimplemented on the TPU backend).
    angles = jax.lax.complex(jnp.cos(init_phase), jnp.sin(init_phase))
    magnitude = magnitude.astype(jnp.float32)

    def step(carry, _):
        angles, tprev = carry
        inverse = istft(
            magnitude * angles,
            n_fft=n_fft,
            hop_length=hop_length,
            win_length=win_length,
        )
        rebuilt = stft(
            inverse, n_fft=n_fft, hop_length=hop_length, win_length=win_length
        )
        update = rebuilt - (momentum / (1.0 + momentum)) * tprev
        new_angles = update / (jnp.abs(update) + 1e-16)
        return (new_angles, rebuilt), None

    zero = jnp.zeros_like(angles)
    (angles, _), _ = jax.lax.scan(step, (angles, zero), None, length=n_iter)
    return istft(
        magnitude * angles,
        n_fft=n_fft,
        hop_length=hop_length,
        win_length=win_length,
        length=length,
    )


def amp_to_audio(amp, key, n_iter: int = 50, hop_length: int = 256,
                 win_length: int = 1024):
    """Griffin-Lim from a magnitude spectrum (reference: tools.py:220-223)."""
    return griffin_lim(amp, key, n_iter=n_iter, hop_length=hop_length,
                       win_length=win_length)


def nn_data_to_audio(spectrogram_batch, key, n_iter: int = 32,
                     hop_length: int = 256, win_length: int = 1024):
    """Batch of magnitude spectrograms (B, F, T) -> waveforms via
    Griffin-Lim, with the zero DC row restored (reference:
    tools.py:194-217; the deprecated VAE_out_put_to_spc rescale is the
    caller's concern)."""
    import jax.numpy as jnp

    padded = jnp.pad(spectrogram_batch, ((0, 0), (1, 0), (0, 0)))
    return griffin_lim(padded, key, n_iter=n_iter, hop_length=hop_length,
                       win_length=win_length)
