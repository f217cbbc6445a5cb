"""CFG prefix sharing (nn/unet.py cfg_dual): device time of the real
CFG-shaped sampler step — eps = combine(unet(cat([x,x]), cond2B)) — vs the
prefix-shared form unet(x@B, cond2B, cfg_dual=True).

The shared prefix is init_conv + downs_0_0 (the condition first enters at
the downs_0_1 attention), i.e. the most expensive full-resolution ConvNeXt
block; the naive double computes it twice on identical inputs and XLA
cannot CSE across the batch concat.

Run: cd /root/repo && python -u -m benchmarks.micro_cfg_dual
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.device_time import device_time_ms
from diffusynth_tpu.configs import UNetConfig
from diffusynth_tpu.nn.unet import ConditionedUnet

K = 5


def main():
    B = int(os.environ.get("MICRO_CFG_BATCH", "64"))  # user batch
    H, W = 128, 64
    cfg = UNetConfig()
    quant = os.environ.get("MICRO_CFG_QUANT")  # e.g. int8
    if quant:
        import dataclasses
        cfg = dataclasses.replace(cfg, quantize=quant)
        print("quantize:", quant, flush=True)
    model = ConditionedUnet(cfg, dtype=jnp.bfloat16)
    print("devices:", jax.devices(), "user batch:", B, flush=True)

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, W, cfg.in_dim), jnp.bfloat16)
    t = jnp.full((B,), 500, jnp.int32)
    cond2 = jax.random.normal(jax.random.PRNGKey(1), (2 * B, 512),
                              jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(2), x[:1], t[:1],
                                 cond2[:1])

    def combine(eps):
        eps_u, eps_c = jnp.split(eps.astype(jnp.float32), 2, axis=0)
        return eps_u + 6.0 * (eps_c - eps_u)

    def step_double(p, x0):
        def body(carry, _):
            x2 = jnp.concatenate([carry, carry], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            eps = combine(model.apply(p, x2, t2, cond2))
            return carry - (0.01 * eps).astype(carry.dtype), ()
        return jax.lax.scan(body, x0, None, length=K)[0]

    def step_dual(p, x0):
        def body(carry, _):
            eps = combine(model.apply(p, carry, t, cond2, cfg_dual=True))
            return carry - (0.01 * eps).astype(carry.dtype), ()
        return jax.lax.scan(body, x0, None, length=K)[0]

    results = {}
    for name, fn in (("double", step_double), ("dual", step_dual)):
        fwd = jax.jit(fn)
        out = fwd(params, x)
        out.block_until_ready()
        ms = device_time_ms(lambda: fwd(params, x), iters=3)
        results[name] = (ms / K, np.asarray(out[:2], np.float32))
        print(f"{name}: {ms / K:.2f} ms / step (scan of {K})", flush=True)

    d = np.abs(results["double"][1] - results["dual"][1]).max()
    print(f"max|diff| {d:.5f}; dual speedup "
          f"{results['double'][0] / results['dual'][0]:.3f}x "
          f"({results['double'][0] - results['dual'][0]:+.2f} ms/step)",
          flush=True)


if __name__ == "__main__":
    main()
