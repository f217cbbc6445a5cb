"""Phase-vocoder time stretching and pitch shifting in pure JAX.

TPU-native replacement for the reference's per-note librosa.effects.pitch_shift
loop (reference: track_maker.py:12-47,144) - the single biggest track-render
cost there. Here the phase vocoder is one lax.scan, batches over notes via
vmap, and runs on-device; the reference's iterated <=4-semitone passes are
replaced by a single high-resolution pass (n_fft 4096), a deliberate design
difference documented in SURVEY.md section 7.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from diffusynth_tpu.dsp.resample import resample
from diffusynth_tpu.dsp.stft import istft, stft


@functools.partial(jax.jit, static_argnames=("rate", "hop_length"))
def phase_vocoder(D: jnp.ndarray, rate: float, hop_length: int = 1024) -> jnp.ndarray:
    """Speed up a complex spectrogram by `rate` (librosa-compatible math).

    Args:
        D: (..., bins, frames) complex STFT.
        rate: > 1 speeds up (fewer frames), < 1 slows down.
    Returns:
        (..., bins, ceil(frames / rate)) complex STFT.
    """
    *batch, n_bins, n_frames = D.shape
    n_fft = 2 * (n_bins - 1)

    time_steps = np.arange(0, n_frames, rate)            # static host constants
    base = np.minimum(np.floor(time_steps).astype(np.int64), n_frames - 1)
    nxt = np.minimum(base + 1, n_frames)                 # may hit the pad frame
    frac = (time_steps - np.floor(time_steps)).astype(np.float32)

    phi_advance = jnp.asarray(
        np.linspace(0, np.pi * hop_length, n_bins, dtype=np.float32)
    )

    # Pad one zero frame so base+1 gathers stay in range.
    Dp = jnp.concatenate([D, jnp.zeros((*batch, n_bins, 1), D.dtype)], axis=-1)
    mag = jnp.abs(Dp)
    phase = jnp.angle(Dp)

    def step(phase_acc, inputs):
        i0, i1, a = inputs
        m = (1.0 - a) * mag[..., i0] + a * mag[..., i1]
        dphase = phase[..., i1] - phase[..., i0] - phi_advance
        dphase = dphase - 2.0 * jnp.pi * jnp.round(dphase / (2.0 * jnp.pi))
        out_frame = m * jnp.exp(1j * phase_acc)
        return phase_acc + phi_advance + dphase, out_frame

    init_phase = phase[..., 0]
    xs = (jnp.asarray(base), jnp.asarray(nxt), jnp.asarray(frac))
    _, frames = jax.lax.scan(step, init_phase, xs)
    # scan stacks on axis 0: (n_out, ..., bins) -> (..., bins, n_out)
    return jnp.moveaxis(frames, 0, -1)


@functools.partial(
    jax.jit, static_argnames=("rate", "n_fft", "hop_length")
)
def time_stretch(
    y: jnp.ndarray, rate: float, n_fft: int = 4096, hop_length: int | None = None
) -> jnp.ndarray:
    """Stretch signal duration by 1/rate without changing pitch."""
    if hop_length is None:
        hop_length = n_fft // 4
    D = stft(y, n_fft=n_fft, hop_length=hop_length, win_length=n_fft)
    D2 = phase_vocoder(D, rate, hop_length=hop_length)
    length = int(round(y.shape[-1] / rate))
    return istft(
        D2, n_fft=n_fft, hop_length=hop_length, win_length=n_fft, length=length
    )


@functools.partial(
    jax.jit,
    static_argnames=("sample_rate", "n_steps", "bins_per_octave", "n_fft"),
)
def pitch_shift(
    y: jnp.ndarray,
    sample_rate: int,
    n_steps: float,
    bins_per_octave: int = 12,
    n_fft: int = 4096,
) -> jnp.ndarray:
    """Shift pitch by n_steps semitones, preserving duration.

    Batched over leading dims; one XLA program per distinct n_steps (static),
    which pipelines cache per semitone offset.
    """
    if n_steps == 0:
        return y
    rate = 2.0 ** (-float(n_steps) / bins_per_octave)
    stretched = time_stretch(y, rate, n_fft=n_fft)
    # Resample back to the original duration grid: ratio target/orig == rate.
    shifted = resample(
        stretched, orig_sr=float(sample_rate) / rate, target_sr=float(sample_rate)
    )
    n = y.shape[-1]
    cur = shifted.shape[-1]
    if cur >= n:
        return shifted[..., :n]
    pad_widths = [(0, 0)] * (y.ndim - 1) + [(0, n - cur)]
    return jnp.pad(shifted, pad_widths)


def _pitch_shift_batch_impl(
    y: jnp.ndarray,
    sample_rate: int,
    n_steps: jnp.ndarray,
    max_up_steps: int = 36,
    bins_per_octave: int = 12,
    n_fft: int = 4096,
) -> jnp.ndarray:
    """Pitch-shift a batch of signals by PER-ELEMENT (traced) semitone
    amounts in ONE XLA program.

    pitch_shift() compiles one program per distinct n_steps (static shapes
    from the stretch rate) — the dominant track-render cold-start cost
    (one ~25 s remote compile per semitone present in the MIDI). Here the
    vocoder runs over a fixed frame budget sized for max_up_steps — an
    UPWARD shift of n semitones stretches to rate 2^(-n/12) < 1, i.e.
    needs F * 2^(n/12) output frames (invalid frames masked; downward
    shifts need fewer frames than F and always fit). Anti-aliasing for the
    decimating un-stretch of upward shifts is a traced-cutoff mask in the
    frequency domain (replacing the static path's resample filter), and
    the final un-stretch is a traced-position linear interpolation back
    onto the original sample grid.

    y: (B, n); n_steps: (B,) float semitones (positive = up), required to
    be <= max_up_steps for full-length output. Shifts whose |n_steps| <
    1e-6 return the input unchanged (matching pitch_shift).
    """
    B, n = y.shape
    hop = n_fft // 4
    rate = 2.0 ** (-n_steps.astype(jnp.float32) / bins_per_octave)  # (B,)

    D = stft(y, n_fft=n_fft, hop_length=hop, win_length=n_fft)  # (B, nb, F)
    nb, F = D.shape[-2], D.shape[-1]
    budget = int(np.ceil(F * 2.0 ** (max_up_steps / bins_per_octave))) + 1

    phi_advance = jnp.asarray(
        np.linspace(0, np.pi * hop, nb, dtype=np.float32))
    Dp = jnp.concatenate([D, jnp.zeros((B, nb, 1), D.dtype)], axis=-1)
    mag = jnp.abs(Dp)
    phase = jnp.angle(Dp)

    def one(yi, magi, phasei, ri):
        t_steps = jnp.arange(budget, dtype=jnp.float32) * ri
        base = jnp.minimum(jnp.floor(t_steps).astype(jnp.int32), F - 1)
        nxt = jnp.minimum(base + 1, F)
        frac = t_steps - jnp.floor(t_steps)
        valid = (t_steps < F).astype(jnp.float32)

        # The phase recurrence acc_{k+1} = acc_k + phi + dphase_k has no
        # feedback through dphase, so the whole vocoder vectorizes as
        # gathers + a cumulative sum — no lax.scan (the 500-step scan
        # made the remote compile pathological).
        mag0 = magi[:, base]                              # (nb, budget)
        mag1 = magi[:, nxt]
        m = ((1.0 - frac) * mag0 + frac * mag1) * valid
        dphase = phasei[:, nxt] - phasei[:, base] - phi_advance[:, None]
        dphase = dphase - 2.0 * jnp.pi * jnp.round(dphase / (2.0 * jnp.pi))
        inc = phi_advance[:, None] + dphase               # (nb, budget)
        acc = phasei[:, :1] + jnp.concatenate(
            [jnp.zeros((nb, 1), jnp.float32),
             jnp.cumsum(inc[:, :-1], axis=1)], axis=1)
        D2 = jax.lax.complex(m * jnp.cos(acc), m * jnp.sin(acc))

        # Anti-alias for UPWARD shifts (ri < 1): the final interp samples
        # the stretched signal at stride 1/ri > 1 (decimation), so
        # brick-wall at ri * nyquist first.
        k = jnp.arange(nb, dtype=jnp.float32) / (nb - 1)
        D2 = D2 * (k[:, None] <= jnp.minimum(ri, 1.0) + 1e-6)

        stretched = istft(D2, n_fft=n_fft, hop_length=hop, win_length=n_fft,
                          length=hop * (budget - 1))
        L = stretched.shape[-1]
        pos = jnp.arange(n, dtype=jnp.float32) / ri
        i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, L - 2)
        fr = pos - i0.astype(jnp.float32)
        out = stretched[i0] * (1.0 - fr) + stretched[i0 + 1] * fr
        # Past the stretched signal's actual end (ri > 1), emit silence.
        out = out * (pos < hop * (budget - 1)).astype(out.dtype)
        return jnp.where(jnp.abs(ri - 1.0) < 1e-9, yi, out)

    return jax.vmap(one)(y, mag, phase, rate)


# AOT-cached entry point: one ~25-80 s remote compile per
# (batch, length, max_up_steps) bucket is the dominant track-render
# cold-start term (585 s first render, RESULTS_r3.md section 9), so the
# compiled executables persist across processes like the sampler/decode
# programs. AotJit resolves the statics by name whether passed
# positionally or as keywords, and degrades to plain jax.jit on CPU.
from diffusynth_tpu.utils.aot_cache import aot_jit as _aot_jit  # noqa: E402

pitch_shift_batch = _aot_jit(
    _pitch_shift_batch_impl, name="pitch_shift_batch",
    static_argnames=("sample_rate", "max_up_steps", "bins_per_octave",
                     "n_fft"))
