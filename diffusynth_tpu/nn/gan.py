"""One-shot cGAN discriminator (the generator reuses ConditionedUnet).

TPU re-design of reference: model/GAN.py:12-68. BatchNorm is swapped for
GroupNorm (stateless under pjit); output is logits (the reference trains
with BCEWithLogits-equivalent semantics via nn.BCELoss on raw fc output).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffusynth_tpu.nn.layers import conv2d

Dtype = Any


class GANDiscriminator(nn.Module):
    """Conv stack + text-embedding fusion -> scalar logit
    (reference: GAN.py:12-68)."""

    label_emb_dim: int = 512
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, text_emb, train: bool = False):
        """x: (B, H, W, 4) latent; text_emb: (B, label_emb_dim)."""
        for i, feats in enumerate((64, 128, 256, 512)):
            x = conv2d(feats, 4, stride=2, padding=1, dtype=self.dtype)(x)
            if i > 0:
                x = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype)(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
        x = jnp.mean(x, axis=(1, 2))  # adaptive average pool to (B, 512)

        t = nn.Dense(512, dtype=self.dtype)(text_emb)
        t = nn.leaky_relu(t, negative_slope=0.2)

        combined = jnp.concatenate([x, t], axis=-1)
        return nn.Dense(1, dtype=self.dtype)(combined)
