"""Timbre encoder: Dense -> stacked LSTM over the latent time axis -> 4
classification heads.

TPU re-design of reference: model/timbre_encoder_pretrain.py:9-86. The LSTM
is a flax RNN (lax.scan over width <= 256 steps - serial but cheap at this
sequence length; SURVEY.md section 7 "Hard parts").

Input layout: NHWC latents (B, H, W, C); the sequence axis is W and the
per-step feature is the (C, H) column flattened in C-major order so a torch
checkpoint's input_layer weights map 1:1 (reference views (B, C, H, W) as
(B, C*H, W), timbre_encoder_pretrain.py:64-71).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffusynth_tpu.configs import TimbreEncoderConfig

Dtype = Any


class TimbreEncoder(nn.Module):
    config: TimbreEncoderConfig
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C) latent. Returns (feature, instrument_logp,
        family_logp, velocity_logp, qualities_sigmoid)."""
        cfg = self.config
        B, H, W, C = x.shape
        # (B, H, W, C) -> (B, W, C, H) -> (B, W, C*H): C-major feature order.
        seq = jnp.transpose(x, (0, 2, 3, 1)).reshape(B, W, C * H)
        assert C * H == cfg.input_dim, (C * H, cfg.input_dim)

        h = nn.Dense(cfg.feature_dim, dtype=self.dtype, name="input_layer")(seq)
        for i in range(cfg.num_layers):
            # Name the CELL (params land under "lstm_{i}"); naming the RNN
            # wrapper leaves later cells bound at this module's scope.
            cell = nn.OptimizedLSTMCell(cfg.hidden_dim, dtype=self.dtype,
                                        name=f"lstm_{i}")
            h = nn.RNN(cell)(h)
        feature = h[:, -1, :]  # last time step (reference: :72)

        instrument = nn.Dense(cfg.num_instrument_classes, dtype=self.dtype,
                              name="instrument_classifier_layer")(feature)
        family = nn.Dense(cfg.num_instrument_family_classes, dtype=self.dtype,
                          name="instrument_family_classifier_layer")(feature)
        velocity = nn.Dense(cfg.num_velocity_classes, dtype=self.dtype,
                            name="velocity_classifier_layer")(feature)
        qualities = nn.Dense(cfg.num_qualities, dtype=self.dtype,
                             name="qualities_classifier_layer")(feature)

        return (
            feature,
            jax.nn.log_softmax(instrument, axis=-1),
            jax.nn.log_softmax(family, axis=-1),
            jax.nn.log_softmax(velocity, axis=-1),
            jax.nn.sigmoid(qualities),
        )
