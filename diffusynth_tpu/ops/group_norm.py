"""Fused GroupNorm(num_groups=1) as a Pallas TPU kernel.

Profiling the sampling step (benchmarks/RESULTS_r1.md) shows ~60% of device
time in GroupNorm statistic reductions + their normalize passes: the U-Net
has ~72 norm sites per step, each costing XLA three full passes over the
activation (read for stats, read+write for normalize). This kernel computes
stats AND normalizes in a single VMEM residency per batch element - two
passes of HBM traffic instead of three.

Differentiable via custom_vjp (backward recomputes with plain jnp math -
training takes the standard path, inference gets the fused forward).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def gn_barrier_enabled() -> Optional[bool]:
    """Keep GN statistics OUT of producer epilogues? None = batch-aware
    auto (see stats_input); DIFFUSYNTH_GN_BARRIER=1/0 forces on/off.

    Two measured regimes (benchmarks/RESULTS_r2.md):

    - Batch >= 128 (and <= 4): the conv+stat epilogue fusions are
      net-beneficial. The step's top ops are "convert_reduce_fusion"s —
      producers with the per-sample GN stat reduce fused into their
      epilogue — at ~2x the bare producer's cost (7.78 vs 3.89 ms for
      conv 96->192 at 128x64 b128), but forcing the split with an
      optimization barrier measured 266.5 vs 239.9 ms/step: the extra
      standalone passes cost MORE than the epilogues.
    - Batch 8..127: the SAME fusion pattern is catastrophic — 35-70x
      slower per sample (the whole U-Net forward: 424.5 ms at b8 vs
      192 ms at b128; benchmarks/micro_batch_sweep.py). The barrier
      alone fixes it: 18.51 ms at b8 (23x), CHEAPER than the Pallas
      body kernel (22.09 ms) because XLA's dw-conv lowering still wins
      once the pathological reduce fusion is severed.
    """
    import os

    v = os.environ.get("DIFFUSYNTH_GN_BARRIER")
    if v in ("1", "true"):
        return True
    if v in ("0", "false"):
        return False
    return None


def stats_input(x: jnp.ndarray) -> jnp.ndarray:
    """The tensor GN statistics should be computed FROM: behind an
    optimization barrier inside the XLA batch-8..127 reduce-fusion
    cliff on TPU (see gn_barrier_enabled), pass-through elsewhere."""
    forced = gn_barrier_enabled()
    if forced is None:
        barrier = (jax.default_backend() == "tpu"
                   and 8 <= x.shape[0] < 128)
    else:
        barrier = forced
    if barrier:
        return jax.lax.optimization_barrier(x)
    return x


def group_norm_reference(x: jnp.ndarray, scale: jnp.ndarray,
                         bias: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Plain jnp layer-style GroupNorm(num_groups=1) over (B, ..., C)."""
    xb = stats_input(x)
    x32 = xb.astype(jnp.float32)
    axes = tuple(range(1, x.ndim))
    m = jnp.mean(x32, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(x32), axis=axes, keepdims=True) - jnp.square(m)
    out = (x32 - m) * jax.lax.rsqrt(var + eps)
    return (out * scale + bias).astype(x.dtype)


def _gn_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps: float):
    """Stats + normalize in one VMEM residency, bf16-resident.

    The input block never materializes in f32 (that blew VMEM at
    (8192, 192)): the sum accumulates f32 on the fly, the sum of squares
    rides the MXU (bf16 x bf16 -> f32 accumulation is exact), and the
    normalize folds into one fused multiply-add x * a + b with f32-derived
    per-channel a/b.
    """
    x = x_ref[0]                                   # (HW, C), input dtype
    n = x.shape[0] * x.shape[1]
    s1 = jnp.sum(x, dtype=jnp.float32)
    # Sum of squares via the (C, C) Gram matrix on the MXU (f32 accumulate),
    # then the diagonal: HW*C^2 extra FLOPs are negligible and no f32 copy
    # of the block ever materializes.
    gram = jax.lax.dot_general(
        x, x, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    row = jax.lax.broadcasted_iota(jnp.int32, gram.shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, gram.shape, 1)
    s2 = jnp.sum(jnp.where(row == col, gram, 0.0))
    m = s1 / n
    var = s2 / n - m * m
    inv = jax.lax.rsqrt(var + eps)
    scale = scale_ref[0].astype(jnp.float32)       # (C,)
    bias = bias_ref[0].astype(jnp.float32)
    a = (scale * inv).astype(x.dtype)
    b = (bias - m * inv * scale).astype(x.dtype)
    o_ref[0] = x * a + b


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_group_norm(x, scale, bias, eps: float = 1e-5):
    """GroupNorm(num_groups=1) with the fused Pallas forward.

    x: (B, H, W, C) or (B, L, C); scale/bias: (C,).
    """
    return _forward(x, scale, bias, eps)


def _forward(x, scale, bias, eps):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_shape = x.shape
    B, C = x.shape[0], x.shape[-1]
    hw = int(np.prod(x.shape[1:-1]))
    x3 = x.reshape(B, hw, C)

    out = pl.pallas_call(
        functools.partial(_gn_kernel, eps=eps),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, hw, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hw, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, hw, C), x.dtype),
        # NO input_output_aliases: aliasing measured 2x slower (in-place
        # writes serialize against the next block's prefetch;
        # benchmarks/micro_gn.py: 1.27 vs 0.65 ms at (2048, 384) B=128).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x3, scale.reshape(1, C), bias.reshape(1, C))
    return out.reshape(orig_shape)


def _fwd(x, scale, bias, eps):
    return _forward(x, scale, bias, eps), (x, scale, bias)


def _bwd(eps, residuals, g):
    """Backward via jnp (differentiate the reference formulation)."""
    x, scale, bias = residuals
    _, vjp = jax.vjp(lambda x, s, b: group_norm_reference(x, s, b, eps),
                     x, scale, bias)
    return vjp(g)


fused_group_norm.defvjp(_fwd, _bwd)


# Measured on v5e (bf16, B=128, xplane device time; benchmarks/micro_gn.py):
# Pallas DMA collapses to ~178 GB/s when the lane (channel) dim is not a
# multiple of 128 (vs ~657 GB/s aligned), so the fused kernel only wins with
# C % 128 == 0 — 0.61 vs 0.88 ms at (2048, 384). Misaligned or oversized
# blocks take the XLA reference.
_MAX_FUSED_BYTES = 8 * 1024 * 1024


def group_norm_auto(x, scale, bias, eps: float = 1e-5,
                    use_pallas: Optional[bool] = None):
    """Dispatch: fused kernel on TPU when the per-sample block fits VMEM."""
    if use_pallas is None:
        per_sample = int(np.prod(x.shape[1:])) * x.dtype.itemsize
        use_pallas = (
            jax.default_backend() == "tpu"
            and x.shape[-1] % 128 == 0   # lane alignment (see above)
            and per_sample <= _MAX_FUSED_BYTES
        )
    if use_pallas:
        return fused_group_norm(x, scale, bias, eps)
    return group_norm_reference(x, scale, bias, eps)
