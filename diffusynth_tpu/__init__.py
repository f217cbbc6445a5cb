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

# Lazy top-level API: `from diffusynth_tpu import DiffuSynthRuntime` etc.
# without paying every submodule's import cost at package import.
_TOP_LEVEL = {
    "DiffuSynthRuntime": "diffusynth_tpu.pipelines",
    "Text2SoundPipeline": "diffusynth_tpu.pipelines",
    "Sound2SoundPipeline": "diffusynth_tpu.pipelines",
    "InpaintPipeline": "diffusynth_tpu.pipelines",
    "TrackRenderPipeline": "diffusynth_tpu.pipelines",
    "DiffSynthSampler": "diffusynth_tpu.diffusion",
    "AppConfig": "diffusynth_tpu.configs",
    "get_text_encoder": "diffusynth_tpu.text",
}


def __getattr__(name):
    target = _TOP_LEVEL.get(name)
    if target is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(target), name)


def __dir__():
    return sorted(list(globals()) + list(_TOP_LEVEL))
