"""Conditioned diffusion U-Net (NHWC, flax).

TPU re-design of reference: model/diffusion.py:21-258. Same topology:
ConvNeXt blocks, linear cross-attention with the text embedding injected at
every attention (k/q add or k/v concat), triple skip-concats per up stage,
extra bottleneck skips (mid_depth), sinusoidal time embedding + MLP.

Module names mirror the reference state_dict positions (downs_{i}_{j},
mid_left_{i}, mid_mid_{j}, mid_right_{i}, ups_{i}_{j}, final_conv_{j},
time_mlp_{j}, label_embedding) so the weight converter is a mechanical key
translation.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffusynth_tpu.configs import UNetConfig
from diffusynth_tpu.nn.layers import (
    ConvNextBlock,
    LinearCrossAttention,
    LinearCrossAttentionAdd,
    SinusoidalPositionEmbeddings,
    UNetResnetBlock,
    conv2d,
    conv_transpose2d,
    pad_and_concat,
)

Dtype = Any


class _Attn(nn.Module):
    """Residual(PreNorm(linear cross-attention)) as used at every U-Net
    attention site (reference: diffusion.py:122,124,143,158,163,167).
    Inner names: "norm" (PreNorm GN) and "fn" (the attention)."""

    attn_type: str
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, condition=None):
        from diffusynth_tpu.nn.layers import FusedGroupNorm

        h = FusedGroupNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        if self.attn_type == "linear_cat":
            h = LinearCrossAttention(dtype=self.dtype, name="fn")(h, condition)
        elif self.attn_type == "linear_add":
            h = LinearCrossAttentionAdd(dtype=self.dtype, name="fn")(h, condition)
        else:
            raise NotImplementedError(self.attn_type)
        return h + x


class ConditionedUnet(nn.Module):
    """4-level conditional U-Net over STFT+ latents
    (reference: diffusion.py:21-258)."""

    config: UNetConfig
    dtype: Optional[Dtype] = None

    def _block(self, dim_out, name):
        cfg = self.config
        if cfg.use_convnext:
            return ConvNextBlock(
                dim_out, mult=cfg.convnext_mult, dtype=self.dtype, name=name
            )
        return UNetResnetBlock(
            dim_out, groups=cfg.resnet_block_groups, dtype=self.dtype,
            name=name,
        )

    @nn.compact
    def __call__(self, x, time, condition=None):
        """x: (B, H, W, in_dim); time: (B,) int timesteps;
        condition: (B, label_emb_dim) or None. Returns (B, H, W, out_dim)."""
        cfg = self.config
        down_dims = list(cfg.down_dims)
        up_dims = list(cfg.up_dims)
        assert len(down_dims) == len(up_dims)
        assert down_dims[0] == up_dims[-1] and up_dims[0] == down_dims[-1]
        out_dim = cfg.out_dim if cfg.out_dim is not None else cfg.in_dim
        time_dim = cfg.time_dim if cfg.time_dim is not None else down_dims[0] * 4

        # Condition embedding (reference: diffusion_components.py:155-168).
        if condition is not None:
            if cfg.condition_type == "natural_language_prompt":
                condition_emb = nn.Dense(
                    cfg.label_emb_dim, dtype=self.dtype, name="label_embedding"
                )(condition)
            elif cfg.condition_type == "instrument_family":
                condition_emb = nn.Embed(
                    cfg.n_label_class + 1, cfg.label_emb_dim,
                    dtype=self.dtype, name="label_embedding",
                )(condition)
            else:
                raise NotImplementedError(cfg.condition_type)
        else:
            condition_emb = None

        # Time embedding MLP (reference: diffusion.py:99-105).
        if cfg.with_time_emb:
            t = SinusoidalPositionEmbeddings(down_dims[0])(time)
            t = nn.Dense(time_dim, dtype=self.dtype, name="time_mlp_1")(t)
            t = jax.nn.gelu(t)
            time_emb = nn.Dense(time_dim, dtype=self.dtype, name="time_mlp_3")(t)
        else:
            time_emb = None

        h = []
        x = conv2d(down_dims[0], 7, padding=3, dtype=self.dtype,
                   name="init_conv")(x)
        h.append(x)

        # Encoder path (reference: diffusion.py:215-223).
        down_in_out = list(zip(down_dims[:-1], down_dims[1:]))
        for i, (_, dim_out) in enumerate(down_in_out):
            x = self._block(dim_out, f"downs_{i}_0")(x, time_emb)
            x = _Attn(cfg.attn_type, dtype=self.dtype,
                      name=f"downs_{i}_1")(x, condition_emb)
            h.append(x)
            x = self._block(dim_out, f"downs_{i}_2")(x, time_emb)
            x = _Attn(cfg.attn_type, dtype=self.dtype,
                      name=f"downs_{i}_3")(x, condition_emb)
            h.append(x)
            x = conv2d(dim_out, 4, stride=2, padding=1, dtype=self.dtype,
                       name=f"downs_{i}_4")(x)
            h.append(x)

        # Bottleneck (reference: diffusion.py:131-146, 226-238).
        mid_dim = down_dims[-1]
        for i in range(cfg.mid_depth - 1):
            x = self._block(mid_dim, f"mid_left_{i}")(x, time_emb)
            h.append(x)
        x = self._block(mid_dim, "mid_mid_0")(x, time_emb)
        x = _Attn(cfg.attn_type, dtype=self.dtype,
                  name="mid_mid_1")(x, condition_emb)
        x = self._block(mid_dim, "mid_mid_2")(x, time_emb)
        for i in range(cfg.mid_depth - 1):
            x = pad_and_concat(h.pop(), x)
            x = self._block(mid_dim, f"mid_right_{i}")(x, time_emb)

        # Decoder path (reference: diffusion.py:241-253).
        up_in_out = list(zip(up_dims[:-1], up_dims[1:]))
        for i, (up_dim_in, up_dim_out) in enumerate(up_in_out):
            x = pad_and_concat(h.pop(), x)
            x = self._block(up_dim_in, f"ups_{i}_0")(x, time_emb)
            x = _Attn(cfg.attn_type, dtype=self.dtype,
                      name=f"ups_{i}_1")(x, condition_emb)
            x = conv_transpose2d(up_dim_in, 4, 2, 1, dtype=self.dtype,
                                 name=f"ups_{i}_2")(x)

            x = pad_and_concat(h.pop(), x)
            x = self._block(up_dim_out, f"ups_{i}_3")(x, time_emb)
            x = _Attn(cfg.attn_type, dtype=self.dtype,
                      name=f"ups_{i}_4")(x, condition_emb)

            x = pad_and_concat(h.pop(), x)
            x = self._block(up_dim_out, f"ups_{i}_5")(x, time_emb)
            x = _Attn(cfg.attn_type, dtype=self.dtype,
                      name=f"ups_{i}_6")(x, condition_emb)

        # Final skip + head (reference: diffusion.py:173-175, 256-257).
        x = pad_and_concat(h.pop(), x)
        assert not h, "skip-connection stack should be empty"
        x = self._block(up_dims[-1], "final_conv_0")(x)
        return conv2d(out_dim, 3, padding=1, dtype=self.dtype,
                      name="final_conv_1")(x)
