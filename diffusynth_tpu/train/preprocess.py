"""Dataset preprocessing: audio -> STFT+ tensors -> (optionally) latents.

Fills the role of the reference's missing data_generation.nsynth module
(SURVEY.md section 1): NSynthDataset.create_latent_representation(VAE,
quantize=False) is reconstructed here as a batch pipeline that

  1. reads WAVs (native C++ reader when built),
  2. adjusts length to the latent grid and RMS-normalizes,
  3. runs STFT -> pad -> STFT+ on device (batched),
  4. optionally encodes to VQ-GAN latents (batched),
  5. writes an HDF5 file in the layout NSynthDataset consumes.

CLI: python -m diffusynth_tpu.train.preprocess --audio-dir wavs/ --out data.hdf5
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from diffusynth_tpu.configs import AppConfig
from diffusynth_tpu.dsp import adjust_audio_length, rms_normalize
from diffusynth_tpu.native import read_wav


def preprocess_audio_files(
    paths: Sequence[str],
    runtime,
    duration_sec: float = 3.0,
    batch_size: int = 16,
    to_latents: bool = False,
):
    """Yield (batch tensor NHWC, metadata dicts) per batch of files."""
    a = runtime.config.audio
    width = a.width_from_duration(duration_sec)
    n_samples = a.audio_length_from_width(width)

    for i in range(0, len(paths), batch_size):
        chunk = paths[i:i + batch_size]
        waves = []
        metas = []
        for p in chunk:
            sr, wave = read_wav(p)
            wave = rms_normalize(jnp.asarray(wave, jnp.float32))
            wave = adjust_audio_length(wave, n_samples, sr, a.sample_rate)
            waves.append(wave)
            metas.append({"path": os.path.basename(p)})
        batch = jnp.stack(waves)
        enc, z, zq = runtime.encode_audio(batch)
        yield (np.asarray(z if to_latents else enc, np.float32), metas)


def build_hdf5(
    audio_dir: str,
    out_path: str,
    runtime=None,
    duration_sec: float = 3.0,
    to_latents: bool = False,
    labels_json: Optional[str] = None,
):
    """Audio directory -> NSynth-layout HDF5 (see train/data.py)."""
    import h5py

    if runtime is None:
        from diffusynth_tpu.pipelines import DiffuSynthRuntime
        from diffusynth_tpu.text import CachedTextEncoder, HashTextEncoder

        runtime = DiffuSynthRuntime(
            AppConfig(),
            text_encoder=CachedTextEncoder(HashTextEncoder(512)),
        )

    paths = sorted(glob.glob(os.path.join(audio_dir, "*.wav")))
    assert paths, f"no WAV files in {audio_dir}"
    labels: Dict[str, Dict] = {}
    if labels_json and os.path.exists(labels_json):
        with open(labels_json) as f:
            labels = json.load(f)

    chunks, metas = [], []
    for batch, m in preprocess_audio_files(
            paths, runtime, duration_sec, to_latents=to_latents):
        chunks.append(batch)
        metas.extend(m)
    data = np.concatenate(chunks, axis=0)

    from diffusynth_tpu.train.data import (INSTRUMENT_FAMILIES,
                                           INSTRUMENT_SOURCES)

    with h5py.File(out_path, "w") as h5:
        # Reference schema dataset names (train/data.py::NSynthDataset
        # docstring): "STFT" for spectrograms, "latent_representation" for
        # encoder outputs (the name the notebooks' loader kwargs select).
        h5.create_dataset(
            "latent_representation" if to_latents else "STFT", data=data)
        fields = {}
        for field, default in (("instrument", 0), ("instrument_family", 0),
                               ("instrument_source", 0), ("velocity", 100),
                               ("pitch", 52)):
            fields[field] = np.asarray(
                [labels.get(m["path"], {}).get(field, default)
                 for m in metas], np.int32)
            h5.create_dataset(field, data=fields[field])
        h5.create_dataset("qualities", data=np.asarray(
            [labels.get(m["path"], {}).get("qualities", [0] * 10)
             for m in metas], np.int8))
        # The *_str fields create_key concatenates (tools.py:246-252),
        # stored explicitly so downstream tools never re-derive them.
        h5.create_dataset("instrument_source_str", data=np.asarray([
            INSTRUMENT_SOURCES[v % len(INSTRUMENT_SOURCES)].encode()
            for v in fields["instrument_source"]]))
        h5.create_dataset("instrument_family_str", data=np.asarray([
            INSTRUMENT_FAMILIES[v % len(INSTRUMENT_FAMILIES)].encode()
            for v in fields["instrument_family"]]))
        h5.create_dataset(
            "filename",
            data=np.asarray([m["path"].encode() for m in metas]))
    return out_path, data.shape


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--audio-dir", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--duration", type=float, default=3.0)
    parser.add_argument("--latents", action="store_true",
                        help="store VQ-GAN latents instead of STFT+ tensors")
    parser.add_argument("--labels-json", default=None)
    parser.add_argument("--checkpoint", default=None,
                        help="models dir with a trained VQ-GAN (orbax, as "
                             "written by train.run / convert_cli); required "
                             "for meaningful --latents (random-init encodes "
                             "are only useful for pipeline smoke tests)")
    args = parser.parse_args(argv)
    runtime = None
    if args.checkpoint:
        from diffusynth_tpu.pipelines import DiffuSynthRuntime
        from diffusynth_tpu.text import CachedTextEncoder, HashTextEncoder

        runtime = DiffuSynthRuntime.from_pretrained(
            args.checkpoint,
            text_encoder=CachedTextEncoder(HashTextEncoder(512)))
    out, shape = build_hdf5(args.audio_dir, args.out, runtime=runtime,
                            duration_sec=args.duration,
                            to_latents=args.latents,
                            labels_json=args.labels_json)
    print(f"wrote {out} with data shape {shape}")


if __name__ == "__main__":
    main()
