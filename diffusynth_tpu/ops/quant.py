"""Dynamic int8 (W8A8) convolution for the U-Net's MXU-bound 3x3 convs.

The v5e MXU runs int8 x int8 -> int32 at 2x the bf16 rate (394 TOPS), but
the win only materializes when the contraction dim fills 128-wide tiles:
measured speedups (benchmarks/micro_int8.py, xplane device time, incl. the
dynamic-quant overhead) are 1.34-1.36x at K in {384, 768} and <= 1.0x at
K = 96 — so quantization is gated on K >= INT8_MIN_K.

Scheme: symmetric, zero-point-free.
  - weights: per-output-channel scale amax(|w|)/127, quantized inside the
    jitted program (XLA hoists it; the cost is one tiny pass per weight).
  - activations: dynamic per-SAMPLE scale amax(|x|)/127 over each item's
    (H, W, C) — activations here are post-GroupNorm, so the amax is stable
    and per-channel activation scaling is unnecessary. (The win-matrix
    gates below were measured with micro_int8.py's per-tensor scale; the
    shipped per-sample reduce has the same shape class as the GN stat
    passes XLA pipelines well, and the end-to-end step win was re-measured
    with this exact implementation: 239.9 -> 223.3 ms, RESULTS_r2.md H5.)
  - accumulation exact in int32, dequantized into the f32 epilogue.

Gradients: jax.custom_vjp with a straight-through backward that
differentiates the bf16 convolution of the *dequantized* weights — the
path trains (tests/test_ops.py), though quantize is an inference/serving
feature (configs.UNetConfig.quantize).

This is a new TPU-design component with no reference counterpart (the
reference is f32 CUDA throughout); fidelity vs the f32 reference chain is
gated by the BASELINE spectrogram-MAE budget (docs/PARITY_E2E.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Measured win matrix (micro_int8.py Q1/Q3, (Cin, Cout) -> speedup):
# (384,192) 1.96x, (768,384) 1.75x, (384,768) 1.72x, (192,768) 1.24-1.36x;
# but (96,192) 1.07x, (192,96) 1.10x, (96,384) 1.18x and the dynamic-quant
# overhead flips the small-K shapes to a net LOSS (Q3: 96->192 0.93x).
INT8_MIN_K = 256
INT8_SMALL_K = 192      # wins only when the output dim is large
INT8_SMALL_K_MIN_N = 512


def _dn(x_shape, w_shape):
    return jax.lax.conv_dimension_numbers(x_shape, w_shape,
                                          ("NHWC", "HWIO", "NHWC"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def int8_conv(x, w, stride: int = 1, pad: int = 1):
    """Dynamically-quantized conv: x (B,H,W,Cin) bf16/f32, w (kh,kw,Cin,Cout)
    f32. Returns f32 (the caller's epilogue dtype)."""
    return _int8_conv_fwd_impl(x, w, stride, pad)


def _int8_conv_fwd_impl(x, w, stride: int, pad: int):
    w32 = w.astype(jnp.float32)
    ws = jnp.max(jnp.abs(w32), axis=(0, 1, 2)) / 127.0          # (Cout,)
    ws = jnp.maximum(ws, 1e-12)
    wi = jnp.clip(jnp.round(w32 / ws), -127, 127).astype(jnp.int8)

    x32 = x.astype(jnp.float32)
    # Per-SAMPLE activation scale: same reduce shape as the GN statistics
    # XLA already pipelines well (f32[B]), and tighter than per-tensor.
    s = jnp.max(jnp.abs(x32), axis=(1, 2, 3), keepdims=True) / 127.0  # (B,1,1,1)
    s = jnp.maximum(s, 1e-12)
    xi = jnp.clip(jnp.round(x32 / s), -127, 127).astype(jnp.int8)

    acc = jax.lax.conv_general_dilated(
        xi, wi, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=_dn(x.shape, w.shape),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (s * ws)


def _bf16_ref(x, w, stride: int, pad: int):
    return jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (stride, stride),
        ((pad, pad), (pad, pad)), dimension_numbers=_dn(x.shape, w.shape),
    ).astype(jnp.float32)


def _int8_conv_fwd(x, w, stride, pad):
    return _int8_conv_fwd_impl(x, w, stride, pad), (x, w)


def _int8_conv_bwd(stride, pad, res, g):
    x, w = res
    _, vjp = jax.vjp(lambda x, w: _bf16_ref(x, w, stride, pad), x, w)
    return vjp(g)


int8_conv.defvjp(_int8_conv_fwd, _int8_conv_bwd)


def want_int8(quantize, k_dim: int, n_dim: int) -> bool:
    """Gate: quantize mode requested AND (k, n) is in the measured
    int8-win regime (see the table above)."""
    if quantize != "int8":
        return False
    return k_dim >= INT8_MIN_K or (
        k_dim >= INT8_SMALL_K and n_dim >= INT8_SMALL_K_MIN_N)
