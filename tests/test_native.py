"""Native C++ audio runtime tests (compare against numpy reference paths)."""

import numpy as np
import pytest

from diffusynth_tpu.native import (
    AVAILABLE,
    mixdown,
    peak_normalize,
    read_wav,
    rms_normalize_batch,
    sum_tracks,
    write_wav,
)


class TestWavIO:
    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "t.wav")
        data = (np.sin(np.linspace(0, 100, 16000)) * 0.5).astype(np.float32)
        write_wav(path, data, 16000)
        sr, back = read_wav(path)
        assert sr == 16000
        assert len(back) == len(data)
        np.testing.assert_allclose(back, data, atol=1e-3)  # PCM16 quantization

    def test_scipy_interop(self, tmp_path):
        """Our WAV files parse with scipy; scipy's parse with ours."""
        from scipy.io import wavfile

        path = str(tmp_path / "a.wav")
        data = np.random.default_rng(0).uniform(-0.5, 0.5, 4000).astype(
            np.float32)
        write_wav(path, data, 8000)
        sr, parsed = wavfile.read(path)
        assert sr == 8000
        np.testing.assert_allclose(parsed / 32768.0, data, atol=1e-3)

        path2 = str(tmp_path / "b.wav")
        wavfile.write(path2, 8000, (data * 32767).astype(np.int16))
        sr2, back = read_wav(path2)
        assert sr2 == 8000
        np.testing.assert_allclose(back, data, atol=1e-3)


class TestNormalize:
    def test_peak(self):
        x = np.random.default_rng(0).uniform(-0.2, 0.2, (3, 100))
        out = peak_normalize(x)
        np.testing.assert_allclose(np.abs(out).max(axis=1), 1.0, rtol=1e-5)

    def test_peak_zero_row_safe(self):
        x = np.zeros((2, 10), np.float32)
        x[1, 3] = 0.5
        out = peak_normalize(x)
        assert np.all(out[0] == 0)
        assert abs(out[1, 3] - 1.0) < 1e-6

    def test_rms(self):
        x = np.random.default_rng(1).standard_normal((2, 1000))
        out = rms_normalize_batch(x, 0.1)
        rms = np.sqrt((out**2).mean(axis=1))
        np.testing.assert_allclose(rms, 0.1, rtol=1e-4)


class TestMixdown:
    def test_matches_numpy_reference(self):
        rng = np.random.default_rng(0)
        notes = [rng.standard_normal(n).astype(np.float32)
                 for n in (100, 50, 80, 100)]
        starts = [0, 30, 150, 30]
        track_of = [0, 0, 1, 1]
        lengths = [200, 250]

        buffers = mixdown(notes, starts, track_of, lengths)
        # Independent numpy oracle.
        expect = [np.zeros(l, np.float32) for l in lengths]
        for a, s, t in zip(notes, starts, track_of):
            end = min(s + len(a), lengths[t])
            expect[t][s:end] += a[: end - s]
        for got, want in zip(buffers, expect):
            np.testing.assert_allclose(got, want, atol=1e-6)

        full = sum_tracks(buffers)
        assert len(full) == 250
        np.testing.assert_allclose(
            full[:200], expect[0] + expect[1][:200], atol=1e-6)

    def test_note_past_end_clipped(self):
        notes = [np.ones(100, np.float32)]
        buffers = mixdown(notes, [90], [0], [120])
        assert buffers[0][89] == 0
        assert buffers[0][95] == 1
        assert len(buffers[0]) == 120

    def test_native_available(self):
        """The C++ library should be built in this environment."""
        assert AVAILABLE, "run `make -C native` to build the audio runtime"
