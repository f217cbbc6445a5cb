"""DiffuSynth-TPU: a TPU-native (JAX/XLA/Pallas) text-guided latent-diffusion
timbre synthesizer and MIDI track renderer.

Re-designed from scratch for TPU hardware with the same capabilities as the
reference PyTorch implementation (WxuanYuan/diffusynth):

  audio -> STFT -> "STFT+" 3-channel codec -> VQ-GAN latent (4 x 128 x W)
        -> text-conditioned U-Net denoiser -> DDIM/DDPM sampling
        -> VQ quantize + decode -> inverse STFT -> waveform

Design principles (TPU-first, not a port):
  * NHWC layouts everywhere (TPU conv-native), bfloat16 compute option.
  * The whole denoising loop is ONE jitted ``lax.scan`` (CFG batch-doubling,
    inpaint mask blending and per-step noise folded into the scan body),
    instead of the reference's Python-level per-step loop
    (reference: model/DiffSynthSampler.py:424-517).
  * Static shapes: latent widths are arbitrary but static per compilation;
    pipelines bucket widths so XLA caches a small number of programs.
  * Multi-chip scaling via jax.sharding.Mesh + batch-axis sharding (DP over
    ICI); MIDI track rendering batches all notes across chips instead of the
    reference's serial per-note loop (reference: track_maker.py:131-147).
"""

__version__ = "0.1.0"

from diffusynth_tpu import configs  # noqa: F401
