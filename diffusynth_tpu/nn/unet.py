"""Conditioned diffusion U-Net (NHWC, flax).

TPU re-design of reference: model/diffusion.py:21-258. Same topology:
ConvNeXt blocks, linear cross-attention with the text embedding injected at
every attention (k/q add or k/v concat), triple skip-concats per up stage,
extra bottleneck skips (mid_depth), sinusoidal time embedding + MLP.

Module names mirror the reference state_dict positions (downs_{i}_{j},
mid_left_{i}, mid_mid_{j}, mid_right_{i}, ups_{i}_{j}, final_conv_{j},
time_mlp_{j}, label_embedding) so the weight converter is a mechanical key
translation.

(Round 1 carried a parallel "channel-padded chain" execution mode here; it
measured 432 vs 238 ms/step and was removed in round 2 — the evidence
chain lives in benchmarks/RESULTS_kernel_fusion.md and RESULTS_r2.md.)
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffusynth_tpu.configs import UNetConfig
from diffusynth_tpu.nn.layers import (
    ConvNextBlock,
    LinearCrossAttention,
    SinusoidalPositionEmbeddings,
    UNetResnetBlock,
    conv2d,
    conv_transpose2d,
    pad_and_concat,
)

Dtype = Any


class _LinearAddParams(nn.Module):
    """Declares LinearCrossAttentionAdd's params (same names/shapes/inits)
    without computing — the fused attention-site kernel consumes the raw
    weights. Param tree is identical to the module path, so checkpoints and
    the torch converter are unaffected."""

    channels: int
    hidden: int

    @nn.compact
    def __call__(self, condition_dim: Optional[int] = None):
        from diffusynth_tpu.nn.layers import ConvParams, GNParams

        wqkv, _ = ConvParams((1, 1, self.channels, 3 * self.hidden),
                             use_bias=False, name="to_qkv")()
        if condition_dim is not None:
            wlk, blk = ConvParams((condition_dim, self.hidden),
                                  name="label_key")()
            wlq, blq = ConvParams((condition_dim, self.hidden),
                                  name="label_query")()
        else:
            wlk = blk = wlq = blq = None
        wout, bout = ConvParams((1, 1, self.hidden, self.channels),
                                name="to_out_0")()
        g2s, g2b = GNParams(self.channels, name="to_out_1")()
        return wqkv, wlk, blk, wlq, blq, wout, bout, g2s, g2b


class _Attn(nn.Module):
    """Residual(PreNorm(linear cross-attention)) as used at every U-Net
    attention site (reference: diffusion.py:122,124,143,158,163,167).
    Inner names: "norm" (PreNorm GN) and "fn" (the attention).

    The production "linear_add" variant runs through
    ops/attention_site.py::attention_site — one fused Pallas kernel for the
    whole site on TPU when shapes qualify (two HBM passes instead of ~10);
    "linear_cat" keeps the module path."""

    attn_type: str
    dtype: Optional[Dtype] = None
    use_fused: Optional[bool] = None

    @nn.compact
    def __call__(self, x, condition=None):
        from diffusynth_tpu.nn.layers import FusedGroupNorm, GNParams

        if self.attn_type == "linear_cat":
            h = FusedGroupNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
            h = LinearCrossAttention(dtype=self.dtype, name="fn")(h, condition)
            return h + x
        if self.attn_type != "linear_add":
            raise NotImplementedError(self.attn_type)

        from diffusynth_tpu.ops.attention_site import attention_site

        heads, dim_head = 4, 32
        F = heads * dim_head
        B, H, W, C = x.shape
        gpre_s, gpre_b = GNParams(C, name="norm")()
        cond_dim = condition.shape[-1] if condition is not None else None
        (wqkv, wlk, blk, wlq, blq, wout, bout, g2s, g2b) = _LinearAddParams(
            C, F, name="fn")(cond_dim)

        xc = x.astype(self.dtype) if self.dtype is not None else x
        if condition is not None:
            cnd = (condition.astype(self.dtype)
                   if self.dtype is not None else condition)
            lk = cnd @ wlk.astype(cnd.dtype) + blk.astype(cnd.dtype)
            lq = cnd @ wlq.astype(cnd.dtype) + blq.astype(cnd.dtype)
            label_kq = jnp.concatenate([lk, lq], axis=-1)
        else:
            label_kq = jnp.zeros((B, 2 * F), xc.dtype)
        return attention_site(
            xc, label_kq, wqkv.reshape(C, 3 * F), wout.reshape(F, C), bout,
            gpre_s, gpre_b, g2s, g2b, heads=heads, dim_head=dim_head,
            n=H * W * C, use_pallas=self.use_fused)


class ConditionedUnet(nn.Module):
    """4-level conditional U-Net over STFT+ latents
    (reference: diffusion.py:21-258)."""

    config: UNetConfig
    dtype: Optional[Dtype] = None

    def _block(self, dim_out, name):
        cfg = self.config
        if cfg.use_convnext:
            return ConvNextBlock(
                dim_out, mult=cfg.convnext_mult, dtype=self.dtype,
                use_fused=cfg.fused_kernels, quantize=cfg.quantize,
                name=name
            )
        return UNetResnetBlock(
            dim_out, groups=cfg.resnet_block_groups, dtype=self.dtype,
            name=name,
        )

    @nn.compact
    def __call__(self, x, time, condition=None, cfg_dual: bool = False):
        """x: (B, H, W, in_dim); time: (B,) int timesteps;
        condition: (B, label_emb_dim) or None. Returns (B, H, W, out_dim).

        cfg_dual: classifier-free-guidance prefix sharing. The condition
        first enters the network at the downs_0_1 attention, so for the
        CFG batch-double (reference: DiffSynthSampler.py:314-320, x_in =
        cat([x]*2) with [uncond; cond] labels) the init_conv and downs_0_0
        activations of the two halves are IDENTICAL — XLA cannot CSE
        across the batch concat, so the naive double computes the most
        expensive full-resolution ConvNeXt block twice. With cfg_dual=True
        the caller passes x/time at the HALF batch B and condition at 2B
        ([uncond; cond]); the condition-independent prefix runs once at B
        and the result is batch-tiled before the first conditioned op.
        Output is (2B, H, W, out_dim) = exactly __call__(cat([x, x]),
        cat([time, time]), condition) (tests/test_nn.py). Measured device
        win at the production config: benchmarks/RESULTS_r2.md H13."""
        cfg = self.config
        down_dims = list(cfg.down_dims)
        up_dims = list(cfg.up_dims)
        assert len(down_dims) == len(up_dims)
        assert down_dims[0] == up_dims[-1] and up_dims[0] == down_dims[-1]
        out_dim = cfg.out_dim if cfg.out_dim is not None else cfg.in_dim
        time_dim = cfg.time_dim if cfg.time_dim is not None else down_dims[0] * 4

        if cfg_dual:
            assert condition is not None, "cfg_dual requires a condition"
            assert condition.shape[0] == 2 * x.shape[0], (
                "cfg_dual: condition batch must be 2x the x batch "
                f"({condition.shape[0]} vs {x.shape[0]})")

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

        def block(x, dim_out, name, with_time=True):
            return self._block(dim_out, name)(
                x, time_emb if with_time else None)

        def attn(x, name):
            return _Attn(cfg.attn_type, dtype=self.dtype,
                         use_fused=cfg.fused_kernels,
                         name=name)(x, condition_emb)

        h = []
        x = conv2d(down_dims[0], 7, padding=3, dtype=self.dtype,
                   name="init_conv")(x)
        h.append(x)

        # Encoder path (reference: diffusion.py:215-223).
        down_in_out = list(zip(down_dims[:-1], down_dims[1:]))
        for i, (_, dim_out) in enumerate(down_in_out):
            x = block(x, dim_out, f"downs_{i}_0")
            if i == 0 and cfg_dual:
                # End of the condition-independent prefix: widen to the
                # CFG-doubled batch. Rebinding time_emb here is seen by
                # the block() closure for every later call.
                x = jnp.concatenate([x, x], axis=0)
                h = [jnp.concatenate([e, e], axis=0) for e in h]
                if time_emb is not None:
                    time_emb = jnp.concatenate([time_emb, time_emb], axis=0)
            x = attn(x, f"downs_{i}_1")
            h.append(x)
            x = block(x, dim_out, f"downs_{i}_2")
            x = attn(x, f"downs_{i}_3")
            h.append(x)
            x = conv2d(dim_out, 4, stride=2, padding=1, dtype=self.dtype,
                       name=f"downs_{i}_4")(x)
            h.append(x)

        if cfg_dual and not down_in_out:
            # Degenerate single-level config: no conditioned op ran yet.
            x = jnp.concatenate([x, x], axis=0)
            h = [jnp.concatenate([e, e], axis=0) for e in h]
            if time_emb is not None:
                time_emb = jnp.concatenate([time_emb, time_emb], axis=0)

        # Bottleneck (reference: diffusion.py:131-146, 226-238).
        mid_dim = down_dims[-1]
        for i in range(cfg.mid_depth - 1):
            x = block(x, mid_dim, f"mid_left_{i}")
            h.append(x)
        x = block(x, mid_dim, "mid_mid_0")
        x = attn(x, "mid_mid_1")
        x = block(x, mid_dim, "mid_mid_2")
        for i in range(cfg.mid_depth - 1):
            x = pad_and_concat(h.pop(), x)
            x = block(x, mid_dim, f"mid_right_{i}")

        # Decoder path (reference: diffusion.py:241-253).
        up_in_out = list(zip(up_dims[:-1], up_dims[1:]))
        for i, (up_dim_in, up_dim_out) in enumerate(up_in_out):
            x = pad_and_concat(h.pop(), x)
            x = block(x, up_dim_in, f"ups_{i}_0")
            x = attn(x, f"ups_{i}_1")
            x = conv_transpose2d(up_dim_in, 4, 2, 1, dtype=self.dtype,
                                 name=f"ups_{i}_2")(x)

            x = pad_and_concat(h.pop(), x)
            x = block(x, up_dim_out, f"ups_{i}_3")
            x = attn(x, f"ups_{i}_4")

            x = pad_and_concat(h.pop(), x)
            x = block(x, up_dim_out, f"ups_{i}_5")
            x = attn(x, f"ups_{i}_6")

        # Final skip + head (reference: diffusion.py:173-175, 256-257).
        x = pad_and_concat(h.pop(), x)
        assert not h, "skip-connection stack should be empty"
        x = block(x, up_dims[-1], "final_conv_0", with_time=False)
        return conv2d(out_dim, 3, padding=1, dtype=self.dtype,
                      name="final_conv_1")(x)
