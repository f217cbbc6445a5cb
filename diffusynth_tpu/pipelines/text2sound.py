"""Text2Sound: prompt (+ negative prompt) -> batch of timbres.

Reference: webUI/natural_language_guided_4/text2sound.py:45-179. The whole
generation - CFG-guided respaced sampling, quantization, decoding, ISTFT -
runs as two cached XLA launches (sample scan + decode program) per width
bucket.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from diffusynth_tpu.diffusion.schedule import respaced_timesteps
from diffusynth_tpu.pipelines.runtime import DiffuSynthRuntime


@dataclass
class Text2SoundResult:
    latents: jnp.ndarray          # (B, H, W, C) raw sampled latents
    quantized: jnp.ndarray        # (B, H, W, C) VQ-quantized latents
    spectrograms: jnp.ndarray     # (B, F, T, 3) STFT+ encodings
    audio: np.ndarray             # (B, samples) float32 (or PCM int16)
    sample_rate: int


class Text2SoundPipeline:
    def __init__(self, runtime: DiffuSynthRuntime):
        self.runtime = runtime
        self._samplers = {}

    def _sampler_for(self, steps: int, cfg: float, uncond):
        """The guidance scale and negative-prompt embedding are traced
        inputs of the compiled loop (diffusion/sampler.py), so one program
        per (steps, cfg-on/off) serves every cfg value — moving the CFG
        slider or changing the negative prompt never recompiles."""
        key = (steps, cfg != 1.0)
        if key not in self._samplers:
            s = self.runtime.make_sampler()
            s.respace(list(respaced_timesteps(
                self.runtime.config.diffusion.timesteps, steps)))
            self._samplers[key] = s
        s = self._samplers[key]
        if cfg != 1.0:
            s.activate_classifier_free_guidance(cfg, uncond)
        return s

    def __call__(
        self,
        prompt: str,
        negative_prompt: str = "",
        batchsize: int = 1,
        duration_sec: float = 3.0,
        steps: int = 20,
        cfg: float = 6.0,
        sampler: str = "ddim",
        seed: int = 0,
        return_audio: bool = True,
        audio_format: str = "f32",
        fetch_audio: bool = True,
    ) -> Text2SoundResult:
        """fetch_audio=False leaves .audio as a DEVICE array (the device->
        host copy is the caller's sync point) so a pipelined caller —
        serving, bench.py — can overlap fetching run i's audio with
        dispatching run i+1 through the tunnel."""
        rt = self.runtime
        a = rt.config.audio
        width = a.width_from_duration(duration_sec)
        shape = (batchsize, a.latent_height, width, a.channels)

        cond = jnp.broadcast_to(
            rt.encode_text([prompt]), (batchsize, rt.text_encoder.feature_dim)
        )
        uncond = rt.encode_text([negative_prompt])[0]

        s = self._sampler_for(steps, float(cfg), uncond)
        key = jax.random.key(seed)
        latents, _ = s.sample(rt.unet_variables, shape, key, condition=cond,
                              sampler=sampler)

        quantized, spectrograms, audio = rt.decode_latents_full(
            latents, quantize=True, audio_format=audio_format)
        return Text2SoundResult(
            latents=latents,
            quantized=quantized,
            spectrograms=spectrograms,
            audio=((np.asarray(audio) if fetch_audio else audio)
                   if return_audio else None),
            sample_rate=a.sample_rate,
        )
