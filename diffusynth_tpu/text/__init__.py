"""Text conditioning: CLAP text tower — TPU-native flax implementation
(clap_flax, converted from the HF torch checkpoint) with a host-side torch
fallback matching the reference's CPU placement (app.py:44-59) — plus a
deterministic stub for network-free operation, the multimodal projection
wrapper, and an embedding cache."""

from diffusynth_tpu.text.encoders import (
    CachedTextEncoder,
    ClapTextEncoder,
    HashTextEncoder,
    MultiModalTextEncoder,
    get_text_encoder,
)
from diffusynth_tpu.text.clap_flax import (
    ClapTextTower,
    ClapTextTowerConfig,
    FlaxClapTextEncoder,
    convert_clap_text,
)
