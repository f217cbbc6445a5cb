"""CLIP-style multi-modal contrastive model over timbre and text features.

TPU re-design of reference: model/multimodal_model.py:14-141. The text
backbone (CLAP) is external: this module consumes already-extracted text
features (the reference itself runs its text tower on CPU, app.py:59) and
applies the learned projection heads; the timbre tower is the flax
TimbreEncoder.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffusynth_tpu.configs import MultiModalConfig, TimbreEncoderConfig
from diffusynth_tpu.nn.timbre import TimbreEncoder

Dtype = Any


class ProjectionLayer(nn.Module):
    """Linear -> GELU -> Linear -> dropout -> +proj -> LayerNorm
    (reference: multimodal_model.py:14-32)."""

    output_dim: int
    dropout: float = 0.1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        projected = nn.Dense(self.output_dim, dtype=self.dtype, name="projection")(x)
        h = jax.nn.gelu(projected)
        h = nn.Dense(self.output_dim, dtype=self.dtype, name="fc")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = h + projected
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm")(h)


class ProjectionHead(nn.Module):
    """Stack of ProjectionLayers (reference: multimodal_model.py:35-47)."""

    projection_dim: int
    dropout: float = 0.1
    num_layers: int = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(self.num_layers):
            x = ProjectionLayer(self.projection_dim, self.dropout,
                                dtype=self.dtype, name=f"layers_{i}")(x, deterministic)
        return x


def _soft_cross_entropy(logits, targets):
    """(-targets * log_softmax(logits)).sum(-1)
    (reference: multimodal_model.py:124-141)."""
    return -jnp.sum(targets * jax.nn.log_softmax(logits, axis=-1), axis=-1)


class MultiModalModel(nn.Module):
    """Projects timbre features and text features into a shared space and
    computes the symmetric soft-target contrastive loss
    (reference: multimodal_model.py:50-111)."""

    config: MultiModalConfig
    timbre_config: TimbreEncoderConfig
    dtype: Optional[Dtype] = None

    def setup(self):
        cfg = self.config
        self.timbre_encoder = TimbreEncoder(self.timbre_config, dtype=self.dtype)
        self.text_projection = ProjectionHead(
            cfg.multi_modal_emb_dim, cfg.dropout,
            cfg.num_projection_layers, dtype=self.dtype,
        )
        self.spectrogram_projection = ProjectionHead(
            cfg.multi_modal_emb_dim, cfg.dropout,
            cfg.num_projection_layers, dtype=self.dtype,
        )

    def __call__(self, spectrogram_batch, text_features, deterministic=True):
        """Contrastive loss between a latent batch and text features.

        spectrogram_batch: (B, H, W, C) latents; text_features: (B, Dt)
        CLAP text-tower outputs.
        """
        cfg = self.config
        spec_features, *_ = self.timbre_encoder(spectrogram_batch)
        spec_emb = self.spectrogram_projection(spec_features, deterministic)
        text_emb = self.text_projection(text_features, deterministic)

        logits = (text_emb @ spec_emb.T) / cfg.temperature
        images_similarity = spec_emb @ spec_emb.T
        texts_similarity = text_emb @ text_emb.T
        targets = jax.nn.softmax(
            (images_similarity + texts_similarity) / 2.0 * cfg.temperature,
            axis=-1,
        )
        texts_loss = _soft_cross_entropy(logits, targets)
        images_loss = _soft_cross_entropy(logits.T, targets.T)
        return jnp.mean((images_loss + texts_loss) / 2.0)

    def get_text_features(self, text_features, deterministic=True):
        """Project raw CLAP text features into the shared space - the
        production text-conditioning path (reference:
        multimodal_model.py:114-116, app.py:54-59)."""
        return self.text_projection(text_features, deterministic)

    def get_timbre_features(self, spectrogram_batch, deterministic=True):
        spec_features, *_ = self.timbre_encoder(spectrogram_batch)
        return self.spectrogram_projection(spec_features, deterministic)
