"""Sound2Sound: uploaded/recorded audio + text -> style-transferred timbres.

Reference: webUI/natural_language_guided_4/sound2sound_with_text.py:47-269.
Upload path: normalize -> fit length to the latent grid -> STFT -> STFT+ ->
VQ-GAN encode. Generate path: img2img via partial-noise sampling, with the
reference's steps normalization (int(steps / strength) respaced so `steps`
denoising steps actually execute, sound2sound_with_text.py:185).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from diffusynth_tpu.diffusion.schedule import respaced_timesteps
from diffusynth_tpu.dsp import adjust_audio_length, rms_normalize
from diffusynth_tpu.pipelines.runtime import DiffuSynthRuntime


@dataclass
class Sound2SoundResult:
    latents: jnp.ndarray
    quantized: jnp.ndarray
    spectrograms: jnp.ndarray
    audio: np.ndarray
    sample_rate: int


class Sound2SoundPipeline:
    def __init__(self, runtime: DiffuSynthRuntime):
        self.runtime = runtime
        self._samplers = {}

    # -- upload path ---------------------------------------------------------

    def encode_origin_audio(
        self,
        audio: np.ndarray,
        origin_sample_rate: int,
        duration_sec: float = 3.0,
    ):
        """Audio -> (origin STFT+ encoding, latent, quantized latent).

        Mirrors receive_upload_origin_audio (reference:
        sound2sound_with_text.py:47-124): RMS-normalize, resample + fit to
        the latent grid, then encode.
        """
        rt = self.runtime
        a = rt.config.audio
        width = a.width_from_duration(duration_sec)
        audio_length = a.audio_length_from_width(width)

        audio = jnp.asarray(audio, dtype=jnp.float32)
        audio = rms_normalize(audio)
        audio = adjust_audio_length(
            audio, audio_length, origin_sample_rate, a.sample_rate
        )
        enc, z, zq = rt.encode_audio(audio[None])
        return enc, z, zq

    # -- generate path -------------------------------------------------------

    def _sampler_for(self, normalized_steps: int, cfg: float, uncond):
        """One program per (steps, cfg-on/off): the guidance scale and
        negative-prompt embedding are traced inputs (diffusion/sampler.py),
        so changing either never recompiles."""
        key = (normalized_steps, cfg != 1.0)
        if key not in self._samplers:
            s = self.runtime.make_sampler()
            s.respace(list(respaced_timesteps(
                self.runtime.config.diffusion.timesteps, normalized_steps)))
            self._samplers[key] = s
        s = self._samplers[key]
        if cfg != 1.0:
            s.activate_classifier_free_guidance(cfg, uncond)
        return s

    def __call__(
        self,
        origin_latent: jnp.ndarray,     # (1 or B, H, W, C) guide latent
        prompt: str,
        negative_prompt: str = "",
        batchsize: int = 1,
        noising_strength: float = 0.7,
        steps: int = 20,
        cfg: float = 6.0,
        sampler: str = "ddim",
        seed: int = 0,
        audio_format: str = "f32",
    ) -> Sound2SoundResult:
        rt = self.runtime
        a = rt.config.audio
        width = origin_latent.shape[2]
        shape = (batchsize, a.latent_height, width, a.channels)

        cond = jnp.broadcast_to(
            rt.encode_text([prompt]), (batchsize, rt.text_encoder.feature_dim)
        )
        uncond = rt.encode_text([negative_prompt])[0]

        # Steps normalization (reference: sound2sound_with_text.py:185).
        normalized_steps = max(1, int(steps / noising_strength))
        s = self._sampler_for(normalized_steps, float(cfg), uncond)

        guide = jnp.broadcast_to(
            origin_latent[:1], shape
        ) if origin_latent.shape[0] == 1 else origin_latent

        latents, _ = s.img_guided_sample(
            rt.unet_variables, shape, jax.random.key(seed),
            noising_strength=noising_strength, guide_img=guide,
            condition=cond, sampler=sampler,
        )
        quantized, spectrograms, audio = rt.decode_latents_full(
            latents, quantize=True, audio_format=audio_format)
        return Sound2SoundResult(
            latents=latents, quantized=quantized, spectrograms=spectrograms,
            audio=np.asarray(audio), sample_rate=a.sample_rate,
        )
