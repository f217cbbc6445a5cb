"""Shared helpers for the example scripts.

Every example accepts:
  --tiny              miniature geometry + random weights (fast on CPU; the
                      audible output is noise — use it to learn the API)
  --cpu               force the CPU backend (default: whatever JAX picks,
                      i.e. the TPU when one is attached)
  --checkpoint DIR    orbax checkpoint dir (see
                      `python -m diffusynth_tpu.compat.convert_cli --help`
                      to convert the reference's .pth files)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--tiny", action="store_true",
                   help="miniature model + random weights (fast, CPU-friendly)")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--checkpoint", default=None,
                   help="orbax checkpoint dir from compat.convert_cli")
    p.add_argument("--out", default="/tmp/diffusynth_example",
                   help="output directory for WAV/PNG artifacts")
    return p


def tiny_app_config():
    """Miniature geometry for API-learning runs (mirrors tests)."""
    from diffusynth_tpu.configs import tiny_app_config as _tiny

    return _tiny()


def make_runtime(args, mesh=None):
    """Build a DiffuSynthRuntime from the parsed example args."""
    import jax

    if args.cpu:
        # Env var alone is pre-empted by TPU-attached environments; the
        # config update after import is authoritative.
        jax.config.update("jax_platforms", "cpu")

    from diffusynth_tpu.configs import AppConfig
    from diffusynth_tpu.pipelines import DiffuSynthRuntime
    from diffusynth_tpu.text import get_text_encoder

    config = tiny_app_config() if args.tiny else AppConfig()
    # Tiny runs use a 16-dim hash embedding (CLAP is 512-dim and needs its
    # checkpoint); get_text_encoder already wraps with a prompt cache.
    encoder = get_text_encoder(prefer_clap=not args.tiny,
                               feature_dim=16 if args.tiny else 512)

    if args.checkpoint:
        return DiffuSynthRuntime.from_pretrained(
            args.checkpoint, config=config, text_encoder=encoder, seed=0,
            mesh=mesh)
    return DiffuSynthRuntime(config, text_encoder=encoder, seed=0, mesh=mesh)


def save_outputs(out_dir: str, name: str, result) -> None:
    """Write per-sample WAVs (+ a spectrogram PNG when PIL is available)."""
    import numpy as np

    from diffusynth_tpu.native import write_wav
    from diffusynth_tpu.ui.display import spectrogram_to_image

    os.makedirs(out_dir, exist_ok=True)
    audio = np.asarray(result.audio)
    for i in range(audio.shape[0]):
        path = os.path.join(out_dir, f"{name}_{i}.wav")
        write_wav(path, audio[i], result.sample_rate)
        print(f"wrote {path}")
    img = spectrogram_to_image(np.asarray(result.spectrograms[0]))
    try:
        from PIL import Image

        png = os.path.join(out_dir, f"{name}_0.png")
        Image.fromarray(img).save(png)
        print(f"wrote {png}")
    except ImportError:
        pass
