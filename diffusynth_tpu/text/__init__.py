"""Text conditioning: CLAP text tower (host-side torch, as in the reference)
with a deterministic stub for network-free operation, plus the multimodal
projection wrapper and an embedding cache."""

from diffusynth_tpu.text.encoders import (
    CachedTextEncoder,
    ClapTextEncoder,
    HashTextEncoder,
    MultiModalTextEncoder,
    get_text_encoder,
)
