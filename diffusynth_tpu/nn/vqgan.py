"""VQ-GAN: spectrogram encoder/decoder with vector-quantized bottleneck.

TPU re-design of reference: model/VQGAN.py:275-458. Same topology and math
(DownSample k4s2 stacks, ResnetBlocks, single-head linear attention at the
configured channel widths, softplus/tanh STFT+ output head), NHWC layout,
configurable compute dtype for MXU-friendly bfloat16 convs.

Module names mirror the reference state_dict: submodules of the encoder/
decoder are "_layers_{i}" with the SAME index assignment as the reference's
nn.ModuleList (parameterless ReLU entries consume an index), so the weight
converter is a mechanical key translation.

Reference quirk preserved deliberately (SURVEY.md section 7): the reference
constructs its Encoder with the literal string act_type="act_type"
(VQGAN.py:441), which always selects the swish branch; with the shipped
config (act_type="swish") decoder and encoder are both swish, so this
implementation simply honours the configured act_type (= swish).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffusynth_tpu.configs import VQGANConfig
from diffusynth_tpu.nn.layers import (
    DownSample,
    LinearAttention,
    UpSample,
    VQGANResnetBlock,
    conv2d,
    group_norm,
)
from diffusynth_tpu.nn.vq import VectorQuantizer, VectorQuantizerEMA

Dtype = Any


class VQGANEncoder(nn.Module):
    """Alternating ResNet blocks / linear attention / downsampling
    (reference: VQGAN.py:275-326). Input (B, F, T, in_channels) ->
    latent (B, F/2^L, T/2^L, embedding_dim) with L = len(hidden_channels)."""

    hidden_channels: Sequence[int]
    embedding_dim: int
    block_depth: int = 2
    attn_pos: Sequence[int] = ()
    attn_with_skip: bool = True
    act_type: str = "swish"
    num_groups: int = 32
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        hc = list(self.hidden_channels)
        idx = 0  # mirrors the reference ModuleList index

        def nm():
            nonlocal idx
            name = f"_layers_{idx}"
            idx += 1
            return name

        x = DownSample(hc[0], dtype=self.dtype, name=nm())(x)
        current = hc[0]

        for i in range(1, len(hc)):
            for _ in range(self.block_depth - 1):
                x = VQGANResnetBlock(
                    current, act_type=self.act_type,
                    num_groups=self.num_groups, dtype=self.dtype, name=nm(),
                )(x)
                if current in self.attn_pos:
                    x = LinearAttention(
                        1, 32, self.attn_with_skip, dtype=self.dtype,
                        name=nm(),
                    )(x)
            x = group_norm(self.num_groups, dtype=self.dtype, name=nm())(x)
            nm()  # the reference appends a parameterless nn.ReLU here
            x = jax.nn.relu(x)
            x = DownSample(hc[i], dtype=self.dtype, name=nm())(x)
            current = hc[i]

        for _ in range(self.block_depth - 1):
            x = VQGANResnetBlock(
                current, act_type=self.act_type,
                num_groups=self.num_groups, dtype=self.dtype, name=nm(),
            )(x)
            if current in self.attn_pos:
                x = LinearAttention(1, 32, self.attn_with_skip,
                                    dtype=self.dtype, name=nm())(x)

        x = group_norm(self.num_groups, dtype=self.dtype, name=nm())(x)
        nm()  # parameterless ReLU index
        x = jax.nn.relu(x)
        return conv2d(self.embedding_dim, 1, dtype=self.dtype, name=nm())(x)


class VQGANDecoder(nn.Module):
    """Mirror of the encoder with an STFT+ output head: softplus(log-mag),
    tanh(cos), tanh(sin) (reference: VQGAN.py:329-400)."""

    hidden_channels: Sequence[int]
    out_channels: int
    block_depth: int = 2
    attn_pos: Sequence[int] = ()
    attn_with_skip: bool = True
    act_type: str = "swish"
    num_groups: int = 32
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        rhc = list(reversed(self.hidden_channels))
        idx = 0

        def nm():
            nonlocal idx
            name = f"_layers_{idx}"
            idx += 1
            return name

        x = conv2d(rhc[0], 1, use_bias=False, dtype=self.dtype, name=nm())(x)
        current = rhc[0]

        for _ in range(self.block_depth - 1):
            if current in self.attn_pos:
                x = LinearAttention(1, 32, self.attn_with_skip,
                                    dtype=self.dtype, name=nm())(x)
            x = VQGANResnetBlock(
                current, act_type=self.act_type,
                num_groups=self.num_groups, dtype=self.dtype, name=nm(),
            )(x)

        for i in range(1, len(rhc)):
            x = group_norm(self.num_groups, dtype=self.dtype, name=nm())(x)
            nm()  # parameterless ReLU index
            x = jax.nn.relu(x)
            x = UpSample(rhc[i], dtype=self.dtype, name=nm())(x)
            current = rhc[i]
            for _ in range(self.block_depth - 1):
                if current in self.attn_pos:
                    x = LinearAttention(
                        1, 32, self.attn_with_skip, dtype=self.dtype,
                        name=nm(),
                    )(x)
                x = VQGANResnetBlock(
                    current, act_type=self.act_type,
                    num_groups=self.num_groups, dtype=self.dtype, name=nm(),
                )(x)

        x = group_norm(self.num_groups, dtype=self.dtype, name=nm())(x)
        nm()  # parameterless ReLU index
        x = jax.nn.relu(x)
        x = UpSample(current, dtype=self.dtype, name=nm())(x)
        x = VQGANResnetBlock(
            self.out_channels, act_type=self.act_type,
            num_groups=self.num_groups, dtype=self.dtype, name=nm(),
        )(x)

        # STFT+ value-range head (reference: VQGAN.py:394-398).
        log_magnitude = jax.nn.softplus(x[..., 0])
        cos_phase = jnp.tanh(x[..., 1])
        sin_phase = jnp.tanh(x[..., 2])
        return jnp.stack([log_magnitude, cos_phase, sin_phase], axis=-1)


class VQGAN(nn.Module):
    """Encoder -> quantize -> decoder (reference: VQGAN.py:432-458).

    apply() returns (vq_loss, x_recon, aux) with aux carrying perplexity and
    code indices. Sub-modules are reachable via the encode/decode/quantize
    methods for the split-model inference paths (reference splits the VAE at
    gradio_webUI.py:38). Attribute names (_encoder/_vq_vae/_decoder) mirror
    the reference state_dict prefixes.
    """

    config: VQGANConfig
    dtype: Optional[Dtype] = None

    def setup(self):
        cfg = self.config
        self._encoder = VQGANEncoder(
            hidden_channels=cfg.hidden_channels,
            embedding_dim=cfg.embedding_dim,
            block_depth=cfg.block_depth,
            attn_pos=cfg.attn_pos,
            attn_with_skip=cfg.attn_with_skip,
            act_type="swish",  # encoder act quirk: always swish (VQGAN.py:441)
            num_groups=cfg.num_groups,
            dtype=self.dtype,
        )
        if cfg.decay > 0.0:
            self._vq_vae = VectorQuantizerEMA(
                num_embeddings=cfg.num_embeddings,
                embedding_dim=cfg.embedding_dim,
                commitment_cost=cfg.commitment_cost,
                decay=cfg.decay,
                epsilon=cfg.epsilon,
            )
        else:
            self._vq_vae = VectorQuantizer(
                num_embeddings=cfg.num_embeddings,
                embedding_dim=cfg.embedding_dim,
                commitment_cost=cfg.commitment_cost,
            )
        self._decoder = VQGANDecoder(
            hidden_channels=cfg.hidden_channels,
            out_channels=cfg.out_channels,
            block_depth=cfg.block_depth,
            attn_pos=cfg.attn_pos,
            attn_with_skip=cfg.attn_with_skip,
            act_type=cfg.act_type,
            num_groups=cfg.num_groups,
            dtype=self.dtype,
        )

    def __call__(self, x, train: bool = False):
        z = self._encoder(x)
        quantized, vq_loss, aux = self._vq_vae(z, train=train)
        x_recon = self._decoder(quantized)
        return vq_loss, x_recon, aux

    def encode(self, x):
        return self._encoder(x)

    def quantize(self, z, train: bool = False):
        return self._vq_vae(z, train=train)

    def decode(self, z):
        return self._decoder(z)


class _ResNetBlock(nn.Module):
    """Basic ResNet-18 block (3x3 conv x2 + shortcut), NHWC."""

    features: int
    stride: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = conv2d(self.features, 3, stride=self.stride, padding=1,
                   use_bias=False, dtype=self.dtype)(x)
        y = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype)(y)
        y = jax.nn.relu(y)
        y = conv2d(self.features, 3, padding=1, use_bias=False,
                   dtype=self.dtype)(y)
        y = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype)(y)
        if residual.shape[-1] != self.features or self.stride != 1:
            residual = conv2d(self.features, 1, stride=self.stride,
                              use_bias=False, dtype=self.dtype)(residual)
            residual = nn.GroupNorm(
                num_groups=32, epsilon=1e-5, dtype=self.dtype
            )(residual)
        return jax.nn.relu(y + residual)


class VQGANDiscriminator(nn.Module):
    """ResNet-18-topology discriminator with a logit binary head.

    Replaces the reference's pretrained torchvision ResNet-18
    (reference: VQGAN.py:403-429): trained from scratch (no ImageNet init on
    TPU), BatchNorm swapped for GroupNorm (stateless under pjit), and the
    head emits LOGITS - the reference applies Sigmoid in the model and then
    BCEWithLogits on top (VQGAN.py:421,665), a double-sigmoid quirk we fix
    deliberately (documented per SURVEY.md section 7).
    """

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv2d(64, 7, stride=2, padding=3, use_bias=False,
                   dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype)(x)
        x = jax.nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for features, blocks, first_stride in (
            (64, 2, 1), (128, 2, 2), (256, 2, 2), (512, 2, 2)
        ):
            for b in range(blocks):
                x = _ResNetBlock(
                    features, stride=first_stride if b == 0 else 1,
                    dtype=self.dtype,
                )(x, train=train)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        return nn.Dense(1, dtype=self.dtype)(x)  # logits
