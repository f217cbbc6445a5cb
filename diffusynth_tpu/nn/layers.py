"""Shared NN building blocks (NHWC, flax.linen).

TPU-native re-designs of the reference's torch layers
(reference: model/VQGAN.py:12-272, model/diffusion_components.py:22-293):
identical math, channels-last layout, explicit torch-compatible padding so a
weight converter can reach exact numerical parity.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def swish(x):
    """x * sigmoid(x) (reference: VQGAN.py:20-27 'swish' branch)."""
    return jax.nn.silu(x)


def nonlinearity(x, act_type: str = "relu"):
    """Activation dispatch matching the reference (VQGAN.py:20-27)."""
    if act_type == "relu":
        return jax.nn.relu(x)
    return swish(x)


class GroupNorm(nn.Module):
    """GroupNorm over the channel (last) axis, torch-compatible eps."""

    num_groups: int = 32
    epsilon: float = 1e-6
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(
            num_groups=self.num_groups, epsilon=self.epsilon, dtype=self.dtype
        )(x)


def Normalize(num_groups: int = 32, norm_type: str = "groupnorm", dtype=None):
    """Normalization factory (reference: VQGAN.py:12-17).

    batchnorm is intentionally not supported: it carries running statistics
    that complicate pjit and is never used by the shipped configs.
    """
    if norm_type != "groupnorm":
        raise NotImplementedError(f"norm_type={norm_type}")
    return GroupNorm(num_groups=num_groups, epsilon=1e-6, dtype=dtype)


class Conv(nn.Module):
    """2D conv with explicit torch-style symmetric padding, NHWC."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    feature_group_count: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            use_bias=self.use_bias,
            feature_group_count=self.feature_group_count,
            dtype=self.dtype,
        )(x)


class ConvTranspose(nn.Module):
    """2D transposed conv, torch ConvTranspose2d(k=4, s=2, p=1) geometry:
    output spatial size is exactly 2x the input."""

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        # flax explicit padding pads the stride-dilated input, so torch's
        # ConvTranspose2d padding p maps to k - p - 1 per side
        # (out = (in-1)*s - 2p + k in torch terms).
        p = self.kernel_size - self.padding - 1
        return nn.ConvTranspose(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            transpose_kernel=True,  # torch-compatible kernel orientation
            dtype=self.dtype,
        )(x)


class DownSample(nn.Module):
    """Conv k4 s2 p1 halving H and W (reference: VQGAN.py:149-161)."""

    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        return Conv(self.features, 4, stride=2, padding=1, dtype=self.dtype)(x)


class UpSample(nn.Module):
    """ConvTranspose k4 s2 p1 doubling H and W (reference: VQGAN.py:163-174)."""

    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        return ConvTranspose(self.features, 4, 2, 1, dtype=self.dtype)(x)


class VQGANResnetBlock(nn.Module):
    """norm -> act -> conv3x3 (+ optional time emb, second conv) + shortcut.

    Mirrors reference: VQGAN.py:177-244 (the shipped configs use
    double_conv=False and no time embedding).
    """

    out_channels: int
    double_conv: bool = False
    conv_shortcut: bool = False
    dropout: float = 0.0
    act_type: str = "swish"
    num_groups: int = 32
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, temb=None, deterministic: bool = True):
        in_channels = x.shape[-1]
        h = Normalize(self.num_groups, dtype=self.dtype)(x)
        h = nonlinearity(h, self.act_type)
        h = Conv(self.out_channels, 3, padding=1, dtype=self.dtype)(h)

        if temb is not None:
            temb_h = nn.Dense(self.out_channels, dtype=self.dtype)(
                nonlinearity(temb, self.act_type)
            )
            h = h + temb_h[:, None, None, :]

        if self.double_conv:
            h = Normalize(self.num_groups, dtype=self.dtype)(h)
            h = nonlinearity(h, self.act_type)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            h = Conv(self.out_channels, 3, padding=1, dtype=self.dtype)(h)

        if in_channels != self.out_channels:
            if self.conv_shortcut:
                x = Conv(self.out_channels, 3, padding=1, dtype=self.dtype)(x)
            else:
                x = Conv(self.out_channels, 1, dtype=self.dtype)(x)
        return x + h


class LinearAttention(nn.Module):
    """Katharopoulos-style efficient attention as 1x1 convs + einsums.

    Mirrors reference: VQGAN.py:247-272 (k-softmax over the sequence axis,
    no q normalization, optional 1x1 shortcut). O(N * d^2) instead of O(N^2).
    """

    heads: int = 1
    dim_head: int = 32
    with_skip: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        hidden = self.heads * self.dim_head
        qkv = Conv(hidden * 3, 1, use_bias=False, dtype=self.dtype)(x)
        qkv = qkv.reshape(B, H * W, 3, self.heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        k = jax.nn.softmax(k, axis=1)  # softmax over sequence positions
        context = jnp.einsum("bnhd,bnhe->bhde", k, v)
        out = jnp.einsum("bhde,bnhd->bnhe", context, q)
        out = out.reshape(B, H, W, hidden)
        out = Conv(C, 1, dtype=self.dtype)(out)
        if self.with_skip:
            out = out + Conv(C, 1, dtype=self.dtype)(x)
        return out


class SinusoidalPositionEmbeddings(nn.Module):
    """Sinusoidal timestep embedding (reference: diffusion_components.py:42-56)."""

    dim: int

    def __call__(self, time):
        half_dim = self.dim // 2
        freq = math.log(10000.0) / (half_dim - 1)
        freqs = jnp.exp(jnp.arange(half_dim) * -freq)
        args = time.astype(jnp.float32)[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class UNetBlock(nn.Module):
    """conv3x3 -> GroupNorm -> (scale/shift) -> SiLU
    (reference: diffusion_components.py:59-77)."""

    dim_out: int
    groups: int = 8
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, scale_shift=None):
        x = Conv(self.dim_out, 3, padding=1, dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, dtype=self.dtype)(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1.0) + shift
        return jax.nn.silu(x)


class UNetResnetBlock(nn.Module):
    """Two UNetBlocks with an additive time embedding between them
    (reference: diffusion_components.py:80-104)."""

    dim_out: int
    groups: int = 8
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, time_emb=None):
        h = UNetBlock(self.dim_out, self.groups, dtype=self.dtype)(x)
        if time_emb is not None:
            t = nn.Dense(self.dim_out, dtype=self.dtype)(jax.nn.silu(time_emb))
            h = h + t[:, None, None, :]
        h = UNetBlock(self.dim_out, self.groups, dtype=self.dtype)(h)
        if x.shape[-1] != self.dim_out:
            x = Conv(self.dim_out, 1, dtype=self.dtype)(x)
        return h + x


class ConvNextBlock(nn.Module):
    """Depthwise 7x7 (+ time emb) -> GN -> conv3x3 -> GELU -> GN -> conv3x3
    + 1x1 residual (reference: diffusion_components.py:107-139)."""

    dim_out: int
    mult: int = 2
    norm: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, time_emb=None):
        dim = x.shape[-1]
        h = Conv(dim, 7, padding=3, feature_group_count=dim, dtype=self.dtype)(x)

        if time_emb is not None:
            t = nn.Dense(dim, dtype=self.dtype)(jax.nn.gelu(time_emb))
            h = h + t[:, None, None, :]

        if self.norm:
            h = nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=self.dtype)(h)
        h = Conv(self.dim_out * self.mult, 3, padding=1, dtype=self.dtype)(h)
        h = jax.nn.gelu(h)
        h = nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=self.dtype)(h)
        h = Conv(self.dim_out, 3, padding=1, dtype=self.dtype)(h)

        if dim != self.dim_out:
            x = Conv(self.dim_out, 1, dtype=self.dtype)(x)
        return h + x


class LinearCrossAttention(nn.Module):
    """Efficient attention with the condition as one extra k/v token
    ("linear_cat", reference: diffusion_components.py:171-207)."""

    heads: int = 4
    dim_head: int = 32
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, condition=None):
        B, H, W, C = x.shape
        hidden = self.heads * self.dim_head
        scale = self.dim_head ** -0.5

        qkv = Conv(hidden * 3, 1, use_bias=False, dtype=self.dtype)(x)
        qkv = qkv.reshape(B, H * W, 3, self.heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        if condition is not None:
            # One extra key/value token from the label embedding.
            label_k = nn.Dense(hidden, dtype=self.dtype)(condition)
            label_v = nn.Dense(hidden, dtype=self.dtype)(condition)
            label_k = label_k.reshape(B, 1, self.heads, self.dim_head)
            label_v = label_v.reshape(B, 1, self.heads, self.dim_head)
            k = jnp.concatenate([k, label_k], axis=1)
            v = jnp.concatenate([v, label_v], axis=1)

        q = jax.nn.softmax(q, axis=-1) * scale   # softmax over feature axis
        k = jax.nn.softmax(k, axis=1)            # softmax over sequence axis
        context = jnp.einsum("bnhd,bnhe->bhde", k, v)
        out = jnp.einsum("bhde,bnhd->bnhe", context, q)
        out = out.reshape(B, H, W, hidden)
        out = Conv(C, 1, dtype=self.dtype)(out)
        return nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=self.dtype)(out)


class LinearCrossAttentionAdd(nn.Module):
    """Efficient attention with the condition added to k and q
    ("linear_add", reference: diffusion_components.py:252-293;
    the shipped production attention, app.py:40)."""

    heads: int = 4
    dim_head: int = 32
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, condition=None):
        B, H, W, C = x.shape
        hidden = self.heads * self.dim_head
        scale = self.dim_head ** -0.5

        qkv = Conv(hidden * 3, 1, use_bias=False, dtype=self.dtype)(x)
        qkv = qkv.reshape(B, H * W, 3, self.heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        if condition is not None:
            label_k = nn.Dense(hidden, dtype=self.dtype)(condition)
            label_q = nn.Dense(hidden, dtype=self.dtype)(condition)
            k = k + label_k.reshape(B, 1, self.heads, self.dim_head)
            q = q + label_q.reshape(B, 1, self.heads, self.dim_head)

        q = jax.nn.softmax(q, axis=-1) * scale
        k = jax.nn.softmax(k, axis=1)
        context = jnp.einsum("bnhd,bnhe->bhde", k, v)
        out = jnp.einsum("bhde,bnhd->bnhe", context, q)
        out = out.reshape(B, H, W, hidden)
        out = Conv(C, 1, dtype=self.dtype)(out)
        return nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=self.dtype)(out)


class PreNormAttention(nn.Module):
    """Residual(PreNorm(attn)) wrapper (reference:
    diffusion_components.py:22-29,142-152)."""

    attn: Callable
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, condition=None):
        h = nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=self.dtype)(x)
        return self.attn(h, condition) + x


def pad_to_match(encoder_tensor, decoder_tensor):
    """Pad decoder features to the encoder's spatial dims (NHWC).

    Mirrors reference: diffusion_components.py:210-233 (centered padding).
    """
    eh, ew = encoder_tensor.shape[1:3]
    dh, dw = decoder_tensor.shape[1:3]
    delta_h, delta_w = eh - dh, ew - dw
    top, left = delta_h // 2, delta_w // 2
    return jnp.pad(
        decoder_tensor,
        ((0, 0), (top, delta_h - top), (left, delta_w - left), (0, 0)),
    )


def pad_and_concat(encoder_tensor, decoder_tensor):
    """Pad then concat along channels (reference:
    diffusion_components.py:236-249)."""
    return jnp.concatenate(
        [encoder_tensor, pad_to_match(encoder_tensor, decoder_tensor)], axis=-1
    )
