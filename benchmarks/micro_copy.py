"""Microbenchmark: Pallas DMA throughput vs lane-dimension alignment.

Hypothesis from micro_gn: Pallas blocks whose minor (lane) dim is not a
multiple of 128 DMA at ~178 GB/s vs ~657 GB/s aligned. Tests copy kernels
at the U-Net's channel counts and mitigation strategies (flat-128 reshape,
channel padding).

Run: cd /root/repo && python -u -m benchmarks.micro_copy
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from benchmarks.device_time import device_time_ms


def copy_x2(x, nb=1, vmem_mb=100):
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
            vmem_limit_bytes=vmem_mb * 1024 * 1024),
    )(x)


def run(name, fn, x, gb):
    f = jax.jit(fn)
    ms = device_time_ms(lambda: f(x), iters=10)
    print(f"{name:44s} {ms:8.3f} ms  {gb/(ms/1e3):7.1f} GB/s", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    B = 128
    for C, hw in [(96, 8192), (192, 8192), (256, 6144), (384, 2048)]:
        x = jax.random.normal(jax.random.PRNGKey(0), (B, hw, C),
                              dtype=jnp.bfloat16)
        gb = 2 * x.size * 2 / 1e9
        print(f"\n=== (B={B}, hw={hw}, C={C})  r+w {gb*1e3:.0f} MB ===",
              flush=True)
        run("direct copy", lambda v: copy_x2(v, 1), x, gb)
        flat = hw * C // 128
        run("flat-128 reshape copy",
            lambda v: copy_x2(v.reshape(B, flat, 128), 1).reshape(v.shape),
            x, gb)
        if C % 256 != 0:
            flat2 = hw * C // 256
            run("flat-256 reshape copy",
                lambda v: copy_x2(v.reshape(B, flat2, 256), 1).reshape(v.shape),
                x, gb)
        if C % 128:
            Cp = (C + 127) // 128 * 128
            run(f"xla-pad to {Cp} + copy + slice",
                lambda v: copy_x2(
                    jnp.pad(v, ((0, 0), (0, 0), (0, Cp - C))), 1
                )[..., :C], x, gb * (Cp / C))
        # XLA baseline
        run("xla copy x2", lambda v: v * 2.0, x, gb)


if __name__ == "__main__":
    main()
