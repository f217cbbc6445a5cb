"""DSP layer tests: STFT parity vs torch.stft, codec round-trips, Griffin-Lim
convergence, resampling and pitch-shift sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from diffusynth_tpu.dsp import (
    adjust_audio_length,
    adsr_envelope,
    create_key,
    decode_stft,
    depad_stft,
    encode_stft,
    griffin_lim,
    hann_window,
    istft,
    merge_dictionaries,
    pad_stft,
    pitch_shift,
    resample,
    rescale,
    rms_normalize,
    stft,
    time_stretch,
    unrescale,
)

SR = 16000
N_FFT, HOP, WIN = 1024, 256, 1024


def _tone(n=SR, freqs=(220.0, 440.0, 880.0), seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / SR
    sig = sum(np.sin(2 * np.pi * f * t + rng.uniform(0, np.pi)) for f in freqs)
    sig += 0.01 * rng.standard_normal(n)
    return (sig / np.abs(sig).max()).astype(np.float32)


class TestSTFT:
    def test_matches_torch_stft(self):
        y = _tone()
        ours = np.asarray(stft(jnp.asarray(y), N_FFT, HOP, WIN))
        theirs = torch.stft(
            torch.from_numpy(y),
            n_fft=N_FFT,
            hop_length=HOP,
            win_length=WIN,
            window=torch.hann_window(WIN, periodic=True),
            center=True,
            pad_mode="constant",
            return_complex=True,
        ).numpy()
        assert ours.shape == theirs.shape == (N_FFT // 2 + 1, 1 + len(y) // HOP)
        np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-4)

    def test_roundtrip(self):
        # Hop-multiple length so the frames fully cover the signal.
        y = _tone(n=HOP * 62)
        spec = stft(jnp.asarray(y), N_FFT, HOP, WIN)
        rec = np.asarray(istft(spec, N_FFT, HOP, WIN, length=len(y)))
        np.testing.assert_allclose(rec, y, atol=1e-4)

    def test_batched(self):
        y = np.stack([_tone(n=HOP * 32, seed=i) for i in range(3)])
        spec = stft(jnp.asarray(y), N_FFT, HOP, WIN)
        assert spec.shape == (3, N_FFT // 2 + 1, 1 + y.shape[1] // HOP)
        rec = istft(spec, N_FFT, HOP, WIN, length=y.shape[1])
        np.testing.assert_allclose(np.asarray(rec), y, atol=1e-4)

    def test_hann_periodic(self):
        w = np.asarray(hann_window(8))
        expected = 0.5 * (1 - np.cos(2 * np.pi * np.arange(8) / 8))
        np.testing.assert_allclose(w, expected, atol=1e-7)


class TestPadDepad:
    def test_pad_drops_dc_and_pads_time(self):
        D = jnp.ones((513, 100), dtype=jnp.complex64)
        P = pad_stft(D, 256)
        assert P.shape == (512, 256)
        assert np.all(np.asarray(P[:, 100:]) == 0)

    def test_depad_restores_dc_row(self):
        P = jnp.ones((512, 256))
        D = depad_stft(P)
        assert D.shape == (513, 256)
        assert np.all(np.asarray(D[0]) == 0)

    def test_pad_no_crop_when_long(self):
        D = jnp.ones((513, 300), dtype=jnp.complex64)
        assert pad_stft(D, 256).shape == (512, 300)


class TestCodec:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        D = (rng.standard_normal((64, 32)) + 1j * rng.standard_normal((64, 32))).astype(
            np.complex64
        )
        enc = encode_stft(jnp.asarray(D))
        assert enc.shape == (64, 32, 3)
        dec = np.asarray(decode_stft(enc))
        np.testing.assert_allclose(dec, D, atol=1e-4)

    def test_channel_ranges(self):
        D = jnp.asarray(np.random.default_rng(1).standard_normal((8, 8)) * 10 + 0j)
        enc = np.asarray(encode_stft(D))
        assert (enc[..., 0] >= 0).all()          # log1p magnitude
        assert (np.abs(enc[..., 1:]) <= 1 + 1e-6).all()  # cos/sin

    def test_matches_reference_numpy(self):
        """Oracle: the reference's numpy formulation (tools.py:320-345)."""
        rng = np.random.default_rng(2)
        D = rng.standard_normal((16, 8)) + 1j * rng.standard_normal((16, 8))
        ref = np.stack(
            [np.log1p(np.abs(D)), np.cos(np.angle(D)), np.sin(np.angle(D))], axis=0
        )
        ours = np.asarray(encode_stft(jnp.asarray(D), channel_axis=0))
        np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestGriffinLim:
    def test_reconstructs_tone(self):
        y = _tone(n=SR // 2, freqs=(440.0,))
        mag = jnp.abs(stft(jnp.asarray(y), N_FFT, HOP, WIN))
        rec = np.asarray(
            griffin_lim(mag, jax.random.key(0), n_iter=32, hop_length=HOP,
                        win_length=WIN, length=len(y))
        )
        # Phase-blind metric: spectral magnitude correlation.
        mag_rec = np.abs(np.asarray(stft(jnp.asarray(rec), N_FFT, HOP, WIN)))
        mag_ref = np.asarray(mag)
        corr = np.corrcoef(mag_rec.ravel(), mag_ref.ravel())[0, 1]
        assert corr > 0.99


class TestResample:
    def test_preserves_tone_frequency(self):
        y = _tone(freqs=(440.0,))
        y2 = np.asarray(resample(jnp.asarray(y), SR, SR // 2))
        assert y2.shape[-1] == SR // 2
        spec = np.abs(np.fft.rfft(y2))
        peak_hz = np.argmax(spec) * (SR // 2) / len(y2)
        assert abs(peak_hz - 440.0) < 5.0

    def test_identity(self):
        y = jnp.asarray(_tone())
        np.testing.assert_allclose(np.asarray(resample(y, SR, SR)), np.asarray(y))

    def test_adjust_audio_length(self):
        y = jnp.asarray(_tone(n=8000))
        out = adjust_audio_length(y, 6000, SR, SR)
        assert out.shape == (6000,)
        out = adjust_audio_length(y, 10000, SR, SR)
        assert out.shape == (10000,)
        assert np.all(np.asarray(out[8000:]) == 0)


class TestPitchShift:
    @pytest.mark.parametrize("n_steps", [4, -5])
    def test_shifts_peak_frequency(self, n_steps):
        y = _tone(freqs=(440.0,))
        shifted = np.asarray(pitch_shift(jnp.asarray(y), SR, n_steps))
        assert shifted.shape == y.shape
        spec = np.abs(np.fft.rfft(shifted * np.hanning(len(shifted))))
        peak_hz = np.argmax(spec) * SR / len(shifted)
        expected = 440.0 * 2 ** (n_steps / 12)
        assert abs(peak_hz - expected) / expected < 0.03

    def test_zero_shift_identity(self):
        y = jnp.asarray(_tone())
        out = pitch_shift(y, SR, 0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(y))

    def test_time_stretch_length(self):
        y = jnp.asarray(_tone())
        out = time_stretch(y, 2.0)
        assert out.shape[-1] == SR // 2


class TestEnvelopeUtils:
    def test_adsr_shape_and_ramp(self):
        sig = jnp.ones(SR * 3, dtype=jnp.float32)
        out = np.asarray(
            adsr_envelope(sig, SR, duration=1.0, attack_time=0.1,
                          decay_time=0.1, sustain_level=0.5, release_time=0.5)
        )
        assert out.shape[-1] == SR * 2  # duration + 1s release window
        assert out[0] == 0.0
        assert abs(out[int(0.5 * SR)] - 0.5) < 0.01  # sustain level

    def test_rms_normalize(self):
        y = jnp.asarray(_tone()) * 3.7
        out = np.asarray(rms_normalize(y, 0.1))
        assert abs(np.sqrt(np.mean(out**2)) - 0.1) < 1e-5

    def test_rescale_roundtrip(self):
        x = jnp.asarray(np.random.default_rng(0).uniform(0, 10, 100))
        np.testing.assert_allclose(
            np.asarray(unrescale(rescale(x, "log1p"), "log1p")), np.asarray(x),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(
                unrescale(
                    rescale(x, "NormalizedLogisticCompression"),
                    "NormalizedLogisticCompression",
                )
            ),
            np.asarray(x),
            rtol=1e-4,
        )

    def test_create_key(self):
        attrs = {
            "qualities": [0, 1, 0, 0, 1, 0, 0, 0, 0, 0],
            "instrument_source_str": "acoustic",
            "instrument_family_str": "guitar",
        }
        assert create_key(attrs) == "acoustic_guitar_0100100000"

    def test_merge_dictionaries(self):
        assert merge_dictionaries([{"a": 1, "b": 2}, {"b": 3, "c": 4}]) == {
            "a": 1, "b": 5, "c": 4,
        }


class TestPitchShiftBatch:
    """Traced-semitone batched pitch shift (dsp/pitch.py::pitch_shift_batch)
    vs the static-rate path."""

    def test_dominant_frequency_and_parity(self):
        import numpy as np
        from diffusynth_tpu.dsp.pitch import pitch_shift, pitch_shift_batch

        sr = 16000
        t = np.arange(sr) / sr
        y = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        yb = jnp.stack([jnp.asarray(y)] * 3)
        out = np.asarray(pitch_shift_batch(
            yb, sr, jnp.asarray([12.0, -12.0, 0.0]), max_up_steps=24))

        def dom(x):
            X = np.abs(np.fft.rfft(x * np.hanning(len(x))))
            return np.argmax(X) * sr / len(x)

        assert abs(dom(out[0]) - 880.0) < 5.0
        assert abs(dom(out[1]) - 220.0) < 5.0
        # zero shift is the identity (matches pitch_shift's n_steps==0)
        np.testing.assert_array_equal(out[2], y)
        # parity with the static program for a +7 shift
        ref = np.asarray(pitch_shift(jnp.asarray(y), sr, 7))
        got = np.asarray(pitch_shift_batch(
            yb[:1], sr, jnp.asarray([7.0]), max_up_steps=24))[0]
        corr = np.corrcoef(ref, got)[0, 1]
        assert corr > 0.999, corr

    def test_one_program_many_semitones(self):
        """Distinct semitone values reuse ONE compiled program."""
        from diffusynth_tpu.dsp.pitch import pitch_shift_batch

        sr = 16000
        y = jnp.ones((2, sr // 4), jnp.float32)
        sizes0 = pitch_shift_batch._cache_size()
        pitch_shift_batch(y, sr, jnp.asarray([3.0, -5.0]))
        after_first = pitch_shift_batch._cache_size()
        pitch_shift_batch(y, sr, jnp.asarray([9.0, -17.0]))
        assert pitch_shift_batch._cache_size() == after_first
        assert after_first == sizes0 + 1


    def test_high_up_shift_keeps_energy(self):
        """Upward shifts need F * 2^(n/12) vocoder frames; a +40 shift with
        a properly sized budget must not zero the tail (advisor finding r1:
        the budget was sized by the wrong direction's parameter)."""
        import numpy as np
        from diffusynth_tpu.dsp.pitch import pitch_shift_batch

        sr = 16000
        t = np.arange(sr // 2) / sr
        y = np.sin(2 * np.pi * 110 * t).astype(np.float32)
        out = np.asarray(pitch_shift_batch(
            jnp.asarray(y)[None], sr, jnp.asarray([40.0]), max_up_steps=48))[0]
        n = len(y)
        head = float(np.sqrt(np.mean(out[: n // 4] ** 2)))
        tail = float(np.sqrt(np.mean(out[-n // 4:] ** 2)))
        assert head > 1e-3, head
        # The tail must carry comparable energy, not silence.
        assert tail > 0.2 * head, (head, tail)
