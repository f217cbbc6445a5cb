"""Channel-alignment microbenchmarks (round-2 perf investigation).

Question: how much of the U-Net step's sub-roofline execution is the
C=96/192 lane misalignment (TPU tiles the minor dim into 128-wide lanes;
Pallas DMA measured 178 vs 657 GB/s misaligned vs aligned — micro_copy.py)?
Three probes, all xplane device time:

  E1  elementwise-fusion bandwidth on (B, H, W, C) for C in {96,128,192,256}
  E3  3x3 conv MXU throughput at the U-Net's real channel pairs vs padded
  E4  depthwise 7x7 conv bandwidth at the same shapes

Run: cd /root/repo && python -u -m benchmarks.micro_align
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from benchmarks.device_time import device_time_ms

B, H, W = 128, 128, 64


def e1_elementwise():
    print("\n== E1: elementwise chain bandwidth vs lane alignment "
          f"(B,H,W = {B},{H},{W}, bf16)")
    for C in (96, 128, 192, 256, 384):
        x = jnp.ones((B, H, W, C), jnp.bfloat16)
        y = jnp.ones((B, H, W, C), jnp.bfloat16)

        @jax.jit
        def f(x, y):
            # read 2 tensors, write 1 -> 3 passes of logical bytes
            return x * 1.0009765625 + y

        f(x, y).block_until_ready()
        ms = device_time_ms(lambda: f(x, y), iters=10)
        logical = 3 * B * H * W * C * 2
        print(f"  C={C:4d}: {ms:7.3f} ms  {logical/ms*1e3/1e9:7.1f} GB/s "
              f"logical ({logical/1e6:.0f} MB)")


def e3_conv():
    print("\n== E3: 3x3 conv TFLOP/s at real vs 128-padded channel pairs")
    pairs = [
        # (cin, cout, h, w)  -- the U-Net's hot conv shapes at width 64
        (96, 192, 128, 64), (192, 96, 128, 64),
        (128, 256, 128, 64), (256, 128, 128, 64),
        (96, 384, 64, 32), (384, 192, 64, 32),
        (128, 384, 64, 32), (384, 256, 64, 32),
        (192, 768, 32, 16), (768, 384, 32, 16),
        (256, 768, 32, 16), (768, 256, 32, 16),
        (384, 768, 16, 8), (768, 384, 16, 8),
    ]
    for cin, cout, h, w in pairs:
        x = jnp.ones((B, h, w, cin), jnp.bfloat16)
        k = jnp.ones((3, 3, cin, cout), jnp.bfloat16)

        @jax.jit
        def f(x, k):
            dn = jax.lax.conv_dimension_numbers(
                x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)

        f(x, k).block_until_ready()
        ms = device_time_ms(lambda: f(x, k), iters=10)
        flops = 2 * B * h * w * 9 * cin * cout
        print(f"  {cin:4d}->{cout:4d} @{h:3d}x{w:3d}: {ms:7.3f} ms  "
              f"{flops/ms*1e3/1e12:6.1f} TFLOP/s")


def e4_depthwise():
    print("\n== E4: depthwise 7x7 bandwidth (logical GB/s, 2 passes)")
    for C, h, w in ((96, 128, 64), (128, 128, 64), (192, 64, 32),
                    (256, 64, 32), (384, 32, 16)):
        x = jnp.ones((B, h, w, C), jnp.bfloat16)
        k = jnp.ones((7, 7, 1, C), jnp.bfloat16)

        @jax.jit
        def f(x, k):
            dn = jax.lax.conv_dimension_numbers(
                x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), ((3, 3), (3, 3)), dimension_numbers=dn,
                feature_group_count=C)

        f(x, k).block_until_ready()
        ms = device_time_ms(lambda: f(x, k), iters=10)
        logical = 2 * B * h * w * C * 2
        print(f"  C={C:4d} @{h:3d}x{w:3d}: {ms:7.3f} ms  "
              f"{logical/ms*1e3/1e9:7.1f} GB/s logical")


def main():
    print("devices:", jax.devices(), flush=True)
    e1_elementwise()
    e3_conv()
    e4_depthwise()


if __name__ == "__main__":
    main()
