"""int8 conv/matmul microbenchmark (round-2 perf investigation).

Question: does the v5e MXU actually double conv throughput at int8
(394 TOPS peak vs 197 TFLOP/s bf16), and does that survive the
quant/dequant overhead of a dynamically-quantized inference path?

  Q1  3x3 conv at the U-Net's hot shapes: bf16 vs int8xint8->int32
  Q2  1x1 conv as dot_general: bf16 vs int8
  Q3  full dynamic-quant step: absmax-scale + round + int8 conv +
      dequant epilogue, vs the plain bf16 conv it would replace

Run: cd /root/repo && python -u -m benchmarks.micro_int8
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from benchmarks.device_time import device_time_ms

B = 128  # CFG batch (64 doubled)


def _conv(x, k, out_dtype):
    return lax.conv_general_dilated(
        x, k, (1, 1), "SAME",
        dimension_numbers=lax.conv_dimension_numbers(
            x.shape, k.shape, ("NHWC", "HWIO", "NHWC")),
        preferred_element_type=out_dtype)


PAIRS = [
    (96, 192, 128, 64), (192, 96, 128, 64),
    (96, 384, 64, 32), (384, 192, 64, 32),
    (192, 768, 32, 16), (768, 384, 32, 16),
    (384, 768, 16, 8), (768, 384, 16, 8),
]


def q1_conv3x3():
    print("\n== Q1: 3x3 conv bf16 vs int8 (xplane device ms)")
    for cin, cout, h, w in PAIRS:
        flops = 2 * B * h * w * cin * cout * 9

        xb = jnp.ones((B, h, w, cin), jnp.bfloat16)
        kb = jnp.ones((3, 3, cin, cout), jnp.bfloat16)
        fb = jax.jit(lambda x, k: _conv(x, k, jnp.float32))
        fb(xb, kb).block_until_ready()
        ms_b = device_time_ms(lambda: fb(xb, kb), iters=10)

        xi = jnp.ones((B, h, w, cin), jnp.int8)
        ki = jnp.ones((3, 3, cin, cout), jnp.int8)
        fi = jax.jit(lambda x, k: _conv(x, k, jnp.int32))
        fi(xi, ki).block_until_ready()
        ms_i = device_time_ms(lambda: fi(xi, ki), iters=10)

        print(f"  {cin:4d}->{cout:4d} @{h}x{w}: bf16 {ms_b:7.3f} ms "
              f"({flops/ms_b*1e3/1e12:6.1f} TF/s)  int8 {ms_i:7.3f} ms "
              f"({flops/ms_i*1e3/1e12:6.1f} TOP/s)  speedup "
              f"{ms_b/ms_i:5.2f}x")


def q2_conv1x1():
    print("\n== Q2: 1x1 conv (dot_general) bf16 vs int8")
    for cin, cout, h, w in [(96, 96, 128, 64), (384, 384, 32, 16),
                            (768, 768, 16, 8), (512, 512, 64, 64)]:
        m = B * h * w
        flops = 2 * m * cin * cout

        xb = jnp.ones((m, cin), jnp.bfloat16)
        kb = jnp.ones((cin, cout), jnp.bfloat16)
        fb = jax.jit(lambda x, k: jnp.dot(x, k,
                                          preferred_element_type=jnp.float32))
        fb(xb, kb).block_until_ready()
        ms_b = device_time_ms(lambda: fb(xb, kb), iters=10)

        xi = jnp.ones((m, cin), jnp.int8)
        ki = jnp.ones((cin, cout), jnp.int8)
        fi = jax.jit(lambda x, k: jnp.dot(x, k,
                                          preferred_element_type=jnp.int32))
        fi(xi, ki).block_until_ready()
        ms_i = device_time_ms(lambda: fi(xi, ki), iters=10)

        print(f"  {m}x{cin}x{cout}: bf16 {ms_b:7.3f} ms "
              f"({flops/ms_b*1e3/1e12:6.1f} TF/s)  int8 {ms_i:7.3f} ms "
              f"({flops/ms_i*1e3/1e12:6.1f} TOP/s)  speedup "
              f"{ms_b/ms_i:5.2f}x")


def q3_full_dynamic():
    print("\n== Q3: full dynamic-quant conv step vs plain bf16 conv")
    for cin, cout, h, w in [(96, 192, 128, 64), (192, 768, 32, 16),
                            (768, 384, 32, 16), (384, 768, 16, 8)]:
        flops = 2 * B * h * w * cin * cout * 9

        xb = jnp.ones((B, h, w, cin), jnp.bfloat16) * 0.5
        kb = jnp.ones((3, 3, cin, cout), jnp.bfloat16) * 0.01
        fb = jax.jit(lambda x, k: _conv(x, k, jnp.float32)
                     .astype(jnp.bfloat16))
        fb(xb, kb).block_until_ready()
        ms_b = device_time_ms(lambda: fb(xb, kb), iters=10)

        # weights pre-quantized offline: int8 kernel + per-cout f32 scale
        ki = jnp.ones((3, 3, cin, cout), jnp.int8)
        ks = jnp.full((cout,), 0.01, jnp.float32)

        def fq(x, ki, ks):
            # dynamic per-tensor activation scale (abs-max)
            s = jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.0
            xi = jnp.clip(jnp.round(x.astype(jnp.float32) / s),
                          -127, 127).astype(jnp.int8)
            acc = _conv(xi, ki, jnp.int32)
            return (acc.astype(jnp.float32) * (s * ks)).astype(jnp.bfloat16)

        fqj = jax.jit(fq)
        fqj(xb, ki, ks).block_until_ready()
        ms_q = device_time_ms(lambda: fqj(xb, ki, ks), iters=10)

        print(f"  {cin:4d}->{cout:4d} @{h}x{w}: bf16 {ms_b:7.3f} ms  "
              f"dynq-int8 {ms_q:7.3f} ms  speedup {ms_b/ms_q:5.2f}x "
              f"({flops/ms_q*1e3/1e12:6.1f} TOP/s eff)")


if __name__ == "__main__":
    print("devices:", jax.devices())
    q1_conv3x3()
    q2_conv1x1()
    q3_full_dynamic()
