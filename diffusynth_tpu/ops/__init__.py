"""Custom Pallas TPU kernels for the hot ops, with jnp reference fallbacks."""

from diffusynth_tpu.ops.linear_attention import (
    linear_attention_jnp,
    linear_attention_pallas,
    linear_cross_attention,
)
