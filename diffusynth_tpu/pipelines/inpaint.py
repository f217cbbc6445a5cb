"""Inpaint: masked resampling of an uploaded sound guided by text.

Reference: webUI/natural_language_guided_4/inpaint_with_text.py:140-333.
Mask semantics preserved exactly: drawn transparency layers are averaged and
thresholded, zoomed 1/VAE_scale to the latent grid, unioned with the
time/frequency slider rectangle, optionally inverted ("masked" repaints the
drawn region), and flipped vertically (spectrogram images are displayed
flipped).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.ndimage import zoom

from diffusynth_tpu.diffusion.schedule import respaced_timesteps
from diffusynth_tpu.pipelines.runtime import DiffuSynthRuntime


def average_np_arrays(arrays: Sequence[np.ndarray]) -> np.ndarray:
    """Mean of a list of equally-shaped arrays (reference:
    utils.py:340-359)."""
    if not arrays:
        raise ValueError("no arrays to average")
    return np.mean(np.stack([np.asarray(a, dtype=np.float32) for a in arrays]),
                   axis=0)


def build_latent_mask(
    latent_height: int,
    latent_width: int,
    vae_scale: int,
    time_resolution: int,
    drawn_layers: Optional[Sequence[np.ndarray]] = None,
    mask_time_begin: float = 0.0,
    mask_time_end: float = 0.0,
    mask_frequency_begin: int = 0,
    mask_frequency_end: int = 0,
    inpaint_area: str = "masked",
) -> np.ndarray:
    """Latent-grid mask, 1.0 = KEEP (freeze), matching the reference's
    construction (inpaint_with_text.py:204-233).

    drawn_layers: pixel-space (F, T) alpha arrays (or (F, T, C) where the
    last channel is alpha) from an image editor.
    Returns (latent_height, latent_width) float32.
    """
    if drawn_layers:
        avg = average_np_arrays(drawn_layers)
        if avg.ndim == 3:
            avg = avg[:, :, -1]
        merged = np.where(avg > 0, 1.0, 0.0)
        latent_mask = zoom(merged, (1.0 / vae_scale, 1.0 / vae_scale))
        latent_mask = np.clip(latent_mask, 0.0, 1.0)
    else:
        latent_mask = np.zeros((latent_height, latent_width), dtype=np.float32)
    assert latent_mask.shape == (latent_height, latent_width), latent_mask.shape

    # Slider rectangle (times in seconds -> latent columns; reference
    # divides by (VAE_scale * 4) because 4s of audio spans time_resolution
    # frames, inpaint_with_text.py:221-223).
    t0 = int(mask_time_begin * time_resolution / (vae_scale * 4))
    t1 = int(mask_time_end * time_resolution / (vae_scale * 4))
    latent_mask[int(mask_frequency_begin):int(mask_frequency_end), t0:t1] = 1.0

    # "masked" means the DRAWN region gets repainted -> invert so drawn = 0
    # (update) and everything else = 1 (keep).
    if inpaint_area == "masked":
        latent_mask = 1.0 - latent_mask
    # Vertical flip: display space has frequency increasing upward.
    return np.flipud(latent_mask).astype(np.float32).copy()


@dataclass
class InpaintResult:
    latents: jnp.ndarray
    quantized: jnp.ndarray
    spectrograms: jnp.ndarray
    audio: np.ndarray
    sample_rate: int
    latent_mask: np.ndarray


class InpaintPipeline:
    def __init__(self, runtime: DiffuSynthRuntime):
        self.runtime = runtime
        self._samplers = {}

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
        origin_latent: jnp.ndarray,       # (1 or B, H, W, C) guide latent
        latent_mask: np.ndarray,          # (H, W), 1.0 = keep
        prompt: str,
        negative_prompt: str = "",
        batchsize: int = 1,
        noising_strength: float = 1.0,
        steps: int = 20,
        cfg: float = 6.0,
        sampler: str = "ddim",
        seed: int = 0,
        audio_format: str = "f32",
    ) -> InpaintResult:
        rt = self.runtime
        a = rt.config.audio
        width = origin_latent.shape[2]
        shape = (batchsize, a.latent_height, width, a.channels)

        cond = jnp.broadcast_to(
            rt.encode_text([prompt]), (batchsize, rt.text_encoder.feature_dim)
        )
        uncond = rt.encode_text([negative_prompt])[0]

        normalized_steps = max(1, int(steps / noising_strength))
        s = self._sampler_for(normalized_steps, float(cfg), uncond)

        guide = jnp.broadcast_to(origin_latent[:1], shape) \
            if origin_latent.shape[0] == 1 else origin_latent
        mask = jnp.asarray(latent_mask, jnp.float32)[None, :, :, None]

        latents, _ = s.inpaint_sample(
            rt.unet_variables, shape, jax.random.key(seed),
            noising_strength=noising_strength, guide_img=guide, mask=mask,
            condition=cond, sampler=sampler,
        )
        quantized, spectrograms, audio = rt.decode_latents_full(
            latents, quantize=True, audio_format=audio_format)
        return InpaintResult(
            latents=latents, quantized=quantized, spectrograms=spectrograms,
            audio=np.asarray(audio), sample_rate=a.sample_rate,
            latent_mask=latent_mask,
        )
