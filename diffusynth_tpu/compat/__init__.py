"""Interop with the reference's PyTorch checkpoints."""

from diffusynth_tpu.compat.torch_convert import (
    convert_multimodal_state,
    convert_timbre_state,
    convert_unet_state,
    convert_vqgan_state,
    load_reference_checkpoint,
)
