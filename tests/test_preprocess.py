"""Preprocess pipeline: WAVs -> HDF5 -> NSynthDataset round trip."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from diffusynth_tpu.native import write_wav
from diffusynth_tpu.pipelines import DiffuSynthRuntime
from diffusynth_tpu.text import CachedTextEncoder, HashTextEncoder
from diffusynth_tpu.train.data import NSynthDataset, data_iterator
from diffusynth_tpu.train.preprocess import build_hdf5
from tests.test_pipelines import tiny_config


@pytest.fixture(scope="module")
def runtime():
    return DiffuSynthRuntime(
        tiny_config(), text_encoder=CachedTextEncoder(HashTextEncoder(16)),
    )


def _make_wavs(dirpath, n=5, sr=4000):
    rng = np.random.default_rng(0)
    for i in range(n):
        t = np.arange(sr) / sr
        wave = np.sin(2 * np.pi * (110 * (i + 1)) * t).astype(np.float32)
        wave += 0.01 * rng.standard_normal(sr).astype(np.float32)
        write_wav(str(dirpath / f"note_{i}.wav"), wave * 0.5, sr)


class TestPreprocess:
    def test_stft_hdf5_roundtrip(self, runtime, tmp_path):
        _make_wavs(tmp_path)
        out = str(tmp_path / "data.hdf5")
        path, shape = build_hdf5(str(tmp_path), out, runtime=runtime,
                                 duration_sec=1.0)
        a = runtime.config.audio
        width = a.width_from_duration(1.0)
        assert shape == (5, a.freq_resolution, width * a.vae_scale, 3)

        ds = NSynthDataset(out, task="STFT")
        assert len(ds) == 5
        data, attrs = ds.get_batch(np.array([0, 2]))
        assert data.shape == (2, a.freq_resolution, width * a.vae_scale, 3)
        assert len(attrs) == 2 and "qualities" in attrs[0]

        it = data_iterator(ds, batch_size=2, seed=0)
        batch, _ = next(it)
        assert np.isfinite(batch).all()

    def test_latent_hdf5(self, runtime, tmp_path):
        _make_wavs(tmp_path, n=3)
        out = str(tmp_path / "lat.hdf5")
        path, shape = build_hdf5(str(tmp_path), out, runtime=runtime,
                                 duration_sec=1.0, to_latents=True)
        a = runtime.config.audio
        width = a.width_from_duration(1.0)
        assert shape == (3, a.latent_height, width, a.channels)
        ds = NSynthDataset(out, task="latent")
        data, _ = ds.get_batch(np.array([1]))
        assert data.shape == (1, a.latent_height, width, a.channels)

    def test_labels_json(self, runtime, tmp_path):
        import json

        _make_wavs(tmp_path, n=2)
        labels = {"note_0.wav": {"instrument": 7, "instrument_family": 3,
                                 "qualities": [1] * 10}}
        lp = str(tmp_path / "labels.json")
        with open(lp, "w") as f:
            json.dump(labels, f)
        out = str(tmp_path / "data.hdf5")
        build_hdf5(str(tmp_path), out, runtime=runtime, duration_sec=1.0,
                   labels_json=lp)
        ds = NSynthDataset(out)
        _, attrs = ds.get_batch(np.array([0]))
        assert attrs[0]["instrument"] == 7
        assert attrs[0]["qualities"] == [1] * 10
