"""Microbenchmark: GroupNorm(1) kernel variants on the real TPU.

Times a CHAINED on-device loop (lax.fori_loop whose body consumes its own
output) so host/tunnel dispatch effects cancel out - wall time / K is true
device time per op. Diagnoses the single-residency Pallas GN
(ops/group_norm.py) vs XLA at the U-Net's block shapes.

Run: cd /root/repo && python -u -m benchmarks.micro_gn
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffusynth_tpu.ops.group_norm import fused_group_norm, group_norm_reference

from benchmarks.device_time import device_time_ms


def chain_time(op, x, *args):
    """True device seconds per application of op (xplane-trace measured)."""
    f = jax.jit(lambda x, *a: op(x, *a))
    return device_time_ms(lambda: f(x, *args), iters=10) / 1e3


def copy_x2(x, nb=1):
    B, hw, C = x.shape
    return pl.pallas_call(
        lambda x_ref, o_ref: o_ref.__setitem__((...,), x_ref[...] * 2.0),
        grid=(B // nb,),
        in_specs=[pl.BlockSpec((nb, hw, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((nb, hw, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, hw, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x)


def _gn_kernel_v2(x_ref, scale_ref, bias_ref, o_ref, *, eps, use_gram,
                  chunk=512):
    x = x_ref[...]
    nb, hw, C = x.shape
    n = nb * hw * C
    if use_gram:
        x2 = x.reshape(nb * hw, C)
        s1 = jnp.sum(x2, dtype=jnp.float32)
        gram = jax.lax.dot_general(
            x2, x2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        row = jax.lax.broadcasted_iota(jnp.int32, gram.shape, 0)
        col = jax.lax.broadcasted_iota(jnp.int32, gram.shape, 1)
        s2 = jnp.sum(jnp.where(row == col, gram, 0.0))
    else:
        s1 = jnp.float32(0.0)
        s2 = jnp.float32(0.0)
        for i in range(0, hw, chunk):
            c = x[:, i:i + chunk, :].astype(jnp.float32)
            s1 = s1 + jnp.sum(c)
            s2 = s2 + jnp.sum(c * c)
    m = s1 / n
    var = s2 / n - m * m
    inv = jax.lax.rsqrt(var + eps)
    scale = scale_ref[0].astype(jnp.float32)
    bias = bias_ref[0].astype(jnp.float32)
    a = (scale * inv).astype(x.dtype)
    b = (bias - m * inv * scale).astype(x.dtype)
    o_ref[...] = x * a + b


def gn_variant(x, scale, bias, nb=1, use_gram=True):
    B, hw, C = x.shape
    return pl.pallas_call(
        functools.partial(_gn_kernel_v2, eps=1e-5, use_gram=use_gram),
        grid=(B // nb,),
        in_specs=[
            pl.BlockSpec((nb, hw, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, hw, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, hw, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, scale.reshape(1, C), bias.reshape(1, C))


def main():
    print("devices:", jax.devices(), flush=True)
    for (B, hw, C) in [(128, 8192, 192), (128, 2048, 384), (128, 128, 384)]:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (B, hw, C), dtype=jnp.bfloat16)
        scale = jnp.ones((C,), jnp.bfloat16)
        bias = jnp.zeros((C,), jnp.bfloat16)
        gb = 2 * x.size * x.dtype.itemsize / 1e9  # one read + one write
        print(f"\n=== (B={B}, hw={hw}, C={C})  r+w {gb*1e3:.0f} MB ===",
              flush=True)

        rows = [
            ("xla reference (3-pass)",
             lambda c, s, b: group_norm_reference(c, s, b, 1e-5), 1.5),
            ("pallas copy x2 nb=1", lambda c, s, b: copy_x2(c, 1), 1.0),
            ("pallas copy x2 nb=4", lambda c, s, b: copy_x2(c, 4), 1.0),
            ("gn current (gram, alias, nb=1)",
             lambda c, s, b: fused_group_norm(c, s, b, 1e-5), 1.0),
            ("gn gram nb=1",
             lambda c, s, b: gn_variant(c, s, b, 1, True), 1.0),
            ("gn vpu-chunked nb=1",
             lambda c, s, b: gn_variant(c, s, b, 1, False), 1.0),
            ("gn gram nb=4",
             lambda c, s, b: gn_variant(c, s, b, 4, True), 1.0),
        ]
        for name, op, mult in rows:
            try:
                t = chain_time(op, x, scale, bias)
                print(f"{name:44s} {t*1e3:8.3f} ms  {gb*mult/t:7.1f} GB/s",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name:44s} FAILED: {type(e).__name__}", flush=True)

        ref = np.asarray(jax.jit(
            lambda x, s, b: group_norm_reference(x, s, b, 1e-5)
        )(x, scale, bias), np.float32)
        got = np.asarray(jax.jit(
            lambda x, s, b: gn_variant(x, s, b, 1, False)
        )(x, scale, bias), np.float32)
        print("vpu-chunked max-err:", np.abs(ref - got).max(), flush=True)


if __name__ == "__main__":
    main()
