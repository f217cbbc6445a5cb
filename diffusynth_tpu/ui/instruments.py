"""Virtual-instrument collection: save generated sounds as instruments.

Mirrors the reference's add_instrument state writer
(reference: webUI/.../utils.py:270-297): a generated batch result becomes a
named instrument carrying its latent (train-width guide for the track
renderer), quantized latent, audio signal, and display images.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from diffusynth_tpu.ui.display import phase_to_image, spectrogram_to_image


def add_instrument(result, virtual_instruments: Dict, name: str,
                   sample_index: int = 0) -> Dict:
    """Store one sample of a pipeline result as a virtual instrument.

    result: any pipeline result with .latents/.quantized/.spectrograms/.audio
    (Text2SoundResult, Sound2SoundResult, InpaintResult).
    """
    i = sample_index
    virtual_instruments[name] = {
        "latent_representation": np.asarray(result.quantized[i:i + 1]),
        "quantized_latent_representation": np.asarray(
            result.quantized[i:i + 1]),
        "sampler": "ddim",
        "signal": np.asarray(result.audio[i]),
        "spectrogram": np.asarray(result.spectrograms[i]),
        "spectrogram_gradio_image": spectrogram_to_image(
            np.asarray(result.spectrograms[i])),
        "phase_gradio_image": phase_to_image(
            np.asarray(result.spectrograms[i])),
    }
    return virtual_instruments
