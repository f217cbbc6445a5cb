"""Diffusion subsystem: schedules, deterministic noise strategies, dynamic
masks, and the scan-based sampler.

The reference's Python-level per-step denoising loop
(reference: model/DiffSynthSampler.py:424-517) is redesigned as ONE jitted
lax.scan per sampling call - CFG batch-doubling, DDIM/DDPM updates, inpaint
mask blending and per-step noise all live inside the scan body, so a 50-step
sample is a single device launch instead of 50 round-trips.
"""

from diffusynth_tpu.diffusion.schedule import Schedule, q_sample, respaced_timesteps
from diffusynth_tpu.diffusion.noise import repeat_indices, build_noise
from diffusynth_tpu.diffusion.masks import dynamic_mask_profiles
from diffusynth_tpu.diffusion.sampler import DiffSynthSampler
