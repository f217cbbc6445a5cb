"""H16: does int8-activation DMA make the attention-site kernel faster?

The site kernel is DMA-bound at the misaligned-lane rate (x+out blocks,
~150 GB/s; RESULTS_r2.md H6/H12). _pallas_forward_i8 halves those block
bytes (int8 + per-sample scales) at the cost of one XLA-side absmax pass
+ int8 quant write on the input and an elementwise dequant on the output.
This measures whether the trade wins at the production site shapes, both
bare and with a realistic consumer (the next block's 7x7 depthwise conv,
which decides whether the dequant fuses or materializes).

Run: cd /root/repo && python -u -m benchmarks.micro_attn_int8
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from benchmarks.device_time import device_time_ms
from diffusynth_tpu.ops.attention_site import (
    _attention_site_fused,
    _attention_site_fused_i8,
    attention_site_reference,
)

# Production U-Net site shapes at CFG batch 128 (sampler b64), width 64:
# level: (C, H, W). L0 dominates (H6 attribution).
SITES = [
    ("L0", 96, 128, 64),
    ("L1", 96, 64, 32),
    ("L2", 192, 32, 16),
]
HEADS, DIM_HEAD = 4, 32
F = HEADS * DIM_HEAD


def make_args(key, B, C, H, W):
    ks = jax.random.split(key, 8)
    return dict(
        x=(jax.random.normal(ks[0], (B, H, W, C), jnp.float32)
           .astype(jnp.bfloat16)),
        label_kq=(jax.random.normal(ks[1], (B, 2 * F)) * 0.3
                  ).astype(jnp.bfloat16),
        wqkv=jax.random.normal(ks[2], (C, 3 * F)) * 0.05,
        wout=jax.random.normal(ks[3], (F, C)) * 0.05,
        bout=jax.random.normal(ks[4], (C,)) * 0.1,
        gpre_s=jax.random.normal(ks[5], (C,)) * 0.2 + 1.0,
        gpre_b=jnp.zeros((C,)),
        gpost_s=jax.random.normal(ks[6], (C,)) * 0.2 + 1.0,
        gpost_b=jax.random.normal(ks[7], (C,)) * 0.1,
    )


def main():
    print("devices:", jax.devices(), flush=True)
    B = 128
    for name, C, H, W in SITES:
        a = make_args(jax.random.PRNGKey(0), B, C, H, W)
        kw = dict(heads=HEADS, dim_head=DIM_HEAD, scale=DIM_HEAD ** -0.5,
                  eps=1e-5, n=H * W * C)
        static = (HEADS, DIM_HEAD, DIM_HEAD ** -0.5, 1e-5, H * W * C)
        dw = jax.random.normal(jax.random.PRNGKey(9), (7, 7, 1, 1),
                               jnp.float32) * 0.05
        dwk = jnp.tile(dw, (1, 1, C, 1)).astype(jnp.bfloat16)

        def consumer(y):
            return jax.lax.conv_general_dilated(
                y, dwk, (1, 1), [(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=C)

        variants = {
            "xla": functools.partial(attention_site_reference, **kw),
            "pallas_bf16": lambda *v: _attention_site_fused(*v, *static),
            "pallas_int8": lambda *v: _attention_site_fused_i8(*v, *static),
        }
        gb = 2 * B * H * W * C * 2 / 1e9   # bf16 x+out traffic
        print(f"\n=== {name}: B={B} H={H} W={W} C={C} "
              f"(bf16 x+out = {gb*1e3:.0f} MB) ===", flush=True)
        for vname, fn in variants.items():
            bare = jax.jit(lambda *v, f=fn: f(*v))
            chained = jax.jit(lambda *v, f=fn: consumer(f(*v)))
            ms_b = device_time_ms(lambda: bare(*a.values()), iters=10)
            ms_c = device_time_ms(lambda: chained(*a.values()), iters=10)
            print(f"{vname:14s} bare {ms_b:7.3f} ms "
                  f"({gb/(ms_b/1e3):6.1f} GB/s-equiv)   "
                  f"+dwconv {ms_c:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
