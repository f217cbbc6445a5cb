"""Shared NN building blocks (NHWC, flax.linen).

TPU-native re-designs of the reference's torch layers
(reference: model/VQGAN.py:12-272, model/diffusion_components.py:22-293):
identical math, channels-last layout, explicit torch-compatible padding.

Submodules carry EXPLICIT names mirroring the reference's state_dict keys
(norm1/conv1/nin_shortcut, to_qkv/to_out, mlp_1/ds_conv/net_1/..., etc.) so
the torch->flax weight converter (diffusynth_tpu/compat) is a mechanical key
translation - the path to exact numerical parity with pretrained reference
checkpoints.
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


def group_norm(num_groups: int = 32, epsilon: float = 1e-6, dtype=None,
               name: Optional[str] = None) -> nn.GroupNorm:
    """GroupNorm over the channel (last) axis, torch-compatible eps
    (reference Normalize: VQGAN.py:12-17; batchnorm is deliberately
    unsupported - stateless under pjit, unused by shipped configs)."""
    return nn.GroupNorm(num_groups=num_groups, epsilon=epsilon, dtype=dtype,
                        name=name)


class FusedGroupNorm(nn.Module):
    """Drop-in nn.GroupNorm(num_groups=1) with a fused Pallas forward on TPU.

    The sampling step spends ~60% of device time in GroupNorm passes
    (benchmarks/RESULTS_r1.md); the fused kernel computes stats and
    normalizes in one VMEM residency (ops/group_norm.py). Param names/shapes
    match nn.GroupNorm ("scale"/"bias", (C,)), so checkpoints and the torch
    converter are unaffected; on CPU (and for blocks too large for VMEM) it
    evaluates the identical reference formulation.
    """

    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        from diffusynth_tpu.ops.group_norm import group_norm_auto

        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        if self.dtype is not None:
            x = x.astype(self.dtype)
        return group_norm_auto(x, scale, bias, self.epsilon)


class ConvParams(nn.Module):
    """Declares nn.Conv/nn.Dense-compatible params (kernel [+ bias]) without
    computing — identical names, shapes, and initializers (lecun_normal /
    zeros), so checkpoints and the torch converter see no difference. Used
    by the fused-kernel paths that consume raw weights."""

    kshape: Sequence[int]
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            tuple(self.kshape))
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.kshape[-1],))
                if self.use_bias else None)
        return kernel, bias


class GNParams(nn.Module):
    """Declares nn.GroupNorm-compatible params (scale/bias) without
    computing (see ConvParams)."""

    features: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.features,)),
                self.param("bias", nn.initializers.zeros, (self.features,)))


def conv2d(features: int, kernel_size: int, stride: int = 1, padding: int = 0,
           use_bias: bool = True, feature_group_count: int = 1, dtype=None,
           name: Optional[str] = None) -> nn.Conv:
    """2D conv with explicit torch-style symmetric padding, NHWC."""
    return nn.Conv(
        features=features,
        kernel_size=(kernel_size, kernel_size),
        strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        use_bias=use_bias,
        feature_group_count=feature_group_count,
        dtype=dtype,
        name=name,
    )


def conv_transpose2d(features: int, kernel_size: int = 4, stride: int = 2,
                     padding: int = 1, dtype=None,
                     name: Optional[str] = None) -> nn.ConvTranspose:
    """Transposed conv with torch ConvTranspose2d geometry: flax explicit
    padding pads the stride-dilated input, so torch's p maps to k - p - 1
    per side (out = (in-1)*s - 2p + k in torch terms)."""
    p = kernel_size - padding - 1
    return nn.ConvTranspose(
        features=features,
        kernel_size=(kernel_size, kernel_size),
        strides=(stride, stride),
        padding=((p, p), (p, p)),
        transpose_kernel=True,  # torch-compatible kernel orientation
        dtype=dtype,
        name=name,
    )


class DownSample(nn.Module):
    """Conv k4 s2 p1 halving H and W (reference: VQGAN.py:149-161)."""

    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        return conv2d(self.features, 4, stride=2, padding=1,
                      dtype=self.dtype, name="_conv2d")(x)


class UpSample(nn.Module):
    """ConvTranspose k4 s2 p1 doubling H and W (reference: VQGAN.py:163-174)."""

    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        return conv_transpose2d(self.features, 4, 2, 1, dtype=self.dtype,
                                name="_conv2d")(x)


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
        h = group_norm(self.num_groups, dtype=self.dtype, name="norm1")(x)
        h = nonlinearity(h, self.act_type)
        h = conv2d(self.out_channels, 3, padding=1, dtype=self.dtype,
                   name="conv1")(h)

        if temb is not None:
            temb_h = nn.Dense(self.out_channels, dtype=self.dtype,
                              name="temb_proj")(
                nonlinearity(temb, self.act_type)
            )
            h = h + temb_h[:, None, None, :]

        if self.double_conv:
            h = group_norm(self.num_groups, dtype=self.dtype, name="norm2")(h)
            h = nonlinearity(h, self.act_type)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            h = conv2d(self.out_channels, 3, padding=1, dtype=self.dtype,
                       name="conv2")(h)

        if in_channels != self.out_channels:
            if self.conv_shortcut:
                x = conv2d(self.out_channels, 3, padding=1, dtype=self.dtype,
                           name="conv_shortcut")(x)
            else:
                x = conv2d(self.out_channels, 1, dtype=self.dtype,
                           name="nin_shortcut")(x)
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
        qkv = conv2d(hidden * 3, 1, use_bias=False, dtype=self.dtype,
                     name="to_qkv")(x)
        qkv = qkv.reshape(B, H * W, 3, self.heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        k = jax.nn.softmax(k, axis=1)  # softmax over sequence positions
        context = jnp.einsum("bnhd,bnhe->bhde", k, v)
        out = jnp.einsum("bhde,bnhd->bnhe", context, q)
        out = out.reshape(B, H, W, hidden)
        out = conv2d(C, 1, dtype=self.dtype, name="to_out")(out)
        if self.with_skip:
            out = out + conv2d(C, 1, dtype=self.dtype, name="nin_shortcut")(x)
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
        x = conv2d(self.dim_out, 3, padding=1, dtype=self.dtype, name="proj")(x)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         dtype=self.dtype, name="norm")(x)
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
        h = UNetBlock(self.dim_out, self.groups, dtype=self.dtype,
                      name="block1")(x)
        if time_emb is not None:
            t = nn.Dense(self.dim_out, dtype=self.dtype, name="mlp_1")(
                jax.nn.silu(time_emb))
            h = h + t[:, None, None, :]
        h = UNetBlock(self.dim_out, self.groups, dtype=self.dtype,
                      name="block2")(h)
        if x.shape[-1] != self.dim_out:
            x = conv2d(self.dim_out, 1, dtype=self.dtype, name="res_conv")(x)
        return h + x


class ConvNextBlock(nn.Module):
    """Depthwise 7x7 (+ time emb) -> GN -> conv3x3 -> GELU -> GN -> conv3x3
    + 1x1 residual (reference: diffusion_components.py:107-139).

    Names mirror the torch Sequential indices: net_0/net_3 are the
    GroupNorms, net_1/net_4 the convs, mlp_1 the time Linear.

    The post-depthwise body runs through ops/fused_block.py::convnext_body —
    a single Pallas kernel on TPU when shapes qualify (the whole
    GN->conv->GELU->GN->conv->residual chain in one VMEM residency; 3.2-5.1x
    measured vs XLA at the U-Net's inner levels, benchmarks/micro_convnext),
    and an equivalent XLA formulation otherwise. use_fused forces the
    dispatch (None = auto). real_c/real_d give the real channel counts when
    the caller runs with zero-padded channel lanes (GN statistics then
    count only real elements).
    """

    dim_out: int
    mult: int = 2
    norm: bool = True
    dtype: Optional[Dtype] = None
    use_fused: Optional[bool] = None
    quantize: Optional[str] = None   # None | "int8" (ops/quant.py)

    @nn.compact
    def __call__(self, x, time_emb=None):
        from diffusynth_tpu.ops.fused_block import convnext_body

        dim = x.shape[-1]
        hidden = self.dim_out * self.mult
        H, W = x.shape[1], x.shape[2]
        h = conv2d(dim, 7, padding=3, feature_group_count=dim,
                   dtype=self.dtype, name="ds_conv")(x)

        if time_emb is not None:
            t = nn.Dense(dim, dtype=self.dtype, name="mlp_1")(
                jax.nn.gelu(time_emb))
        else:
            t = None

        if self.norm:
            g1s, g1b = GNParams(dim, name="net_0")()
        else:
            g1s = jnp.ones((dim,), jnp.float32)
            g1b = jnp.zeros((dim,), jnp.float32)
        w1, b1 = ConvParams((3, 3, dim, hidden), name="net_1")()
        g2s, g2b = GNParams(hidden, name="net_3")()
        w2, b2 = ConvParams((3, 3, hidden, self.dim_out), name="net_4")()
        if dim != self.dim_out:
            wres, bres = ConvParams((1, 1, dim, self.dim_out),
                                    name="res_conv")()
        else:
            wres = bres = None

        return convnext_body(
            h, t, x, g1s, g1b, w1, b1, g2s, g2b, w2, b2, wres, bres,
            norm=self.norm, n1=H * W * dim, n2=H * W * hidden,
            use_pallas=self.use_fused, quantize=self.quantize)

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

        qkv = conv2d(hidden * 3, 1, use_bias=False, dtype=self.dtype,
                     name="to_qkv")(x)
        qkv = qkv.reshape(B, H * W, 3, self.heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        if condition is not None:
            # One extra key/value token from the label embedding.
            label_k = nn.Dense(hidden, dtype=self.dtype,
                               name="label_key")(condition)
            label_v = nn.Dense(hidden, dtype=self.dtype,
                               name="label_value")(condition)
            label_k = label_k.reshape(B, 1, self.heads, self.dim_head)
            label_v = label_v.reshape(B, 1, self.heads, self.dim_head)
            k = jnp.concatenate([k, label_k], axis=1)
            v = jnp.concatenate([v, label_v], axis=1)

        # The extra k/v token makes the k/v sequence N+1; the fused kernel
        # requires equal q/k lengths, so this variant stays on the jnp path
        # (the shipped production config uses linear_add).
        q = jax.nn.softmax(q, axis=-1) * scale   # softmax over feature axis
        k = jax.nn.softmax(k, axis=1)            # softmax over sequence axis
        context = jnp.einsum("bnhd,bnhe->bhde", k, v)
        out = jnp.einsum("bhde,bnhd->bnhe", context, q)
        out = out.reshape(B, H, W, hidden)
        out = conv2d(C, 1, dtype=self.dtype, name="to_out_0")(out)
        return FusedGroupNorm(epsilon=1e-5, dtype=self.dtype,
                              name="to_out_1")(out)


class LinearCrossAttentionAdd(nn.Module):
    """Efficient attention with the condition added to k and q
    ("linear_add", reference: diffusion_components.py:252-293;
    the shipped production attention, app.py:40).

    use_pallas: None = auto (fused Pallas kernel on TPU when shapes
    qualify), True/False forces. The fused kernel keeps the softmaxes and
    both contractions in VMEM, cutting the HBM traffic of the attention
    intermediates.
    """

    heads: int = 4
    dim_head: int = 32
    dtype: Optional[Dtype] = None
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x, condition=None):
        from diffusynth_tpu.ops.linear_attention import linear_cross_attention

        B, H, W, C = x.shape
        hidden = self.heads * self.dim_head
        scale = self.dim_head ** -0.5

        qkv = conv2d(hidden * 3, 1, use_bias=False, dtype=self.dtype,
                     name="to_qkv")(x)
        qkv = qkv.reshape(B, H * W, 3, self.heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        if condition is not None:
            label_k = nn.Dense(hidden, dtype=self.dtype,
                               name="label_key")(condition)
            label_q = nn.Dense(hidden, dtype=self.dtype,
                               name="label_query")(condition)
            k = k + label_k.reshape(B, 1, self.heads, self.dim_head)
            q = q + label_q.reshape(B, 1, self.heads, self.dim_head)

        out = linear_cross_attention(q, k, v, self.heads, self.dim_head,
                                     scale, use_pallas=self.use_pallas)
        out = out.reshape(B, H, W, hidden)
        out = conv2d(C, 1, dtype=self.dtype, name="to_out_0")(out)
        return FusedGroupNorm(epsilon=1e-5, dtype=self.dtype,
                              name="to_out_1")(out)


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
