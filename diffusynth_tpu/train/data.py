"""NSynth data pipeline: HDF5-backed dataset + synthetic fallback.

The reference's data layer (data_generation.nsynth) is absent from its repo
(SURVEY.md section 1 "Missing-from-repo"); its contract is reconstructed from
the training notebooks: batches of STFT+ tensors (or precomputed latents)
plus per-sample attribute dicts carrying instrument / instrument_family /
velocity / qualities labels, keyed for caption lookup via create_key
(reference: colab_notebooks/train-VQGAN.ipynb cell 3,
model/diffusion.py:467-476).

Layout: NHWC - STFT+ batches are (B, F, T, 3), latents (B, H, W, C).
"""

from __future__ import annotations

import json
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from diffusynth_tpu.dsp.utils import create_key

INSTRUMENT_SOURCES = ("acoustic", "electronic", "synthetic")
INSTRUMENT_FAMILIES = (
    "bass", "brass", "flute", "guitar", "keyboard", "mallet", "organ",
    "reed", "string", "synth_lead", "vocal",
)


class NSynthDataset:
    """HDF5-backed NSynth spectrogram/latent dataset.

    Expected layout (mirroring data/NSynth/nsynth-STFT-train-52.hdf5 usage):
      * one of datasets "STFT" (N, 3, F, T) / (N, F, T, 3) or
        "latent" (N, C, H, W) / (N, H, W, C)
      * label datasets: "instrument", "instrument_family",
        "instrument_source", "velocity", "qualities" (N, 10)
    Data converts to NHWC on read.
    """

    def __init__(self, path: str, task: str = "STFT"):
        import h5py

        self._h5 = h5py.File(path, "r")
        key = "STFT" if task == "STFT" else "latent"
        if key not in self._h5:
            # tolerate alternate dataset names
            candidates = [k for k in self._h5.keys()
                          if k.lower() in ("stft", "latent", "data")]
            assert candidates, f"no data key in {path}: {list(self._h5.keys())}"
            key = candidates[0]
        self._data = self._h5[key]
        self._channels_first = self._data.shape[1] in (3, 4) and \
            self._data.shape[-1] not in (3, 4)

    def __len__(self) -> int:
        return len(self._data)

    def get_batch(self, indices: np.ndarray) -> Tuple[np.ndarray, List[Dict]]:
        indices = np.sort(indices)
        data = self._data[indices].astype(np.float32)
        if self._channels_first:
            data = np.transpose(data, (0, 2, 3, 1))
        attributes = []
        for i in indices:
            qualities = [int(q) for q in self._h5["qualities"][i]] \
                if "qualities" in self._h5 else [0] * 10
            src = int(self._h5["instrument_source"][i]) \
                if "instrument_source" in self._h5 else 0
            fam = int(self._h5["instrument_family"][i]) \
                if "instrument_family" in self._h5 else 0
            attributes.append({
                "instrument": int(self._h5["instrument"][i])
                if "instrument" in self._h5 else 0,
                "instrument_family": fam,
                "velocity": int(self._h5["velocity"][i])
                if "velocity" in self._h5 else 0,
                "qualities": qualities,
                "instrument_source_str": INSTRUMENT_SOURCES[
                    src % len(INSTRUMENT_SOURCES)],
                "instrument_family_str": INSTRUMENT_FAMILIES[
                    fam % len(INSTRUMENT_FAMILIES)],
            })
        return data, attributes


class SyntheticNSynthDataset:
    """Deterministic synthetic stand-in with the same contract - lets every
    training loop, metric, and benchmark run without the (external) NSynth
    HDF5 files."""

    def __init__(self, n: int = 256, shape: Tuple[int, int, int] = (64, 32, 3),
                 n_instruments: int = 16, seed: int = 0):
        self.n = n
        self.shape = shape
        self.n_instruments = n_instruments
        self._rng = np.random.default_rng(seed)
        # Per-sample class assignments, fixed at construction.
        self._instrument = self._rng.integers(0, n_instruments, n)
        self._family = self._instrument % len(INSTRUMENT_FAMILIES)
        self._velocity = self._rng.integers(0, 128, n)
        self._qualities = self._rng.integers(0, 2, (n, 10))
        self._source = self._instrument % len(INSTRUMENT_SOURCES)

    def __len__(self) -> int:
        return self.n

    def get_batch(self, indices: np.ndarray) -> Tuple[np.ndarray, List[Dict]]:
        data = np.empty((len(indices), *self.shape), dtype=np.float32)
        for j, i in enumerate(indices):
            rng = np.random.default_rng(1000 + int(i))
            # Class-dependent structure so classifiers can actually learn.
            base = rng.standard_normal(self.shape) * 0.1
            base[..., 0] += 0.5 + 0.1 * (self._instrument[i] % 5)
            data[j] = base
        attributes = [
            {
                "instrument": int(self._instrument[i]),
                "instrument_family": int(self._family[i]),
                "velocity": int(self._velocity[i]),
                "qualities": [int(q) for q in self._qualities[i]],
                "instrument_source_str": INSTRUMENT_SOURCES[self._source[i]],
                "instrument_family_str": INSTRUMENT_FAMILIES[self._family[i]],
            }
            for i in indices
        ]
        return data, attributes


def data_iterator(dataset, batch_size: int, shuffle: bool = True,
                  seed: int = 0) -> Iterator[Tuple[np.ndarray, List[Dict]]]:
    """Infinite (data, attributes) batch iterator (the reference training
    loops call next(iter(loader)) forever, diffusion.py:467)."""
    rng = np.random.default_rng(seed)
    n = len(dataset)
    while True:
        if shuffle:
            idx = rng.choice(n, size=batch_size, replace=batch_size > n)
        else:
            start = rng.integers(0, max(n - batch_size, 1))
            idx = np.arange(start, min(start + batch_size, n))
        yield dataset.get_batch(np.asarray(idx))


def attributes_to_keys(attributes: Sequence[Dict]) -> List[str]:
    return [create_key(a) for a in attributes]


def load_caption_mapping(path: str) -> Dict[str, List]:
    """Load a create_key -> captions/embeddings JSON mapping (the GPT caption
    side-data of the reference, SURVEY.md section 1)."""
    with open(path) as f:
        return json.load(f)
