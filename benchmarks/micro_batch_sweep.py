"""U-Net forward device time vs batch dim: fused (Mosaic) vs XLA-only.

Motivation: the config-3 harness row (sound2sound + inpaint at UI batch 4
-> CFG batch 8) is disproportionately slow next to the b64 headline. A
host-side sweep suggested intermediate CFG batches (4-16) pay far more
per sample than either b2 or b128. This measures the actual device time
of the hot op (one U-Net forward at latent width 64) across batch dims
for both kernel dispatch modes, so the auto dispatch gate can be tuned
on data rather than vibes.

Batch dims here are AS THE KERNEL SEES THEM (the CFG sampler doubles the
user batch, pipelines/runtime.py), so UI batch 4 -> 8 below.

Run: cd /root/repo && python -u -m benchmarks.micro_batch_sweep
Prints one JSON line per (batch, mode): {batch, mode, ms, ms_per_sample}.
"""

from __future__ import annotations

import argparse
import dataclasses
import json

import jax
import jax.numpy as jnp

from benchmarks.device_time import device_time_ms
from diffusynth_tpu.configs import UNetConfig
from diffusynth_tpu.nn.unet import ConditionedUnet


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="2,4,8,16,32,64,128")
    p.add_argument("--width", type=int, default=64)
    p.add_argument("--modes", default="fused-auto,xla-only")
    args = p.parse_args()
    modes = {m: {"fused-auto": None, "xla-only": False, "fused-on": True}[m]
             for m in args.modes.split(",")}

    print("devices:", jax.devices(), flush=True)
    cfg = UNetConfig()
    H = 128

    for B in (int(b) for b in args.batches.split(",")):
        x = jax.random.normal(jax.random.PRNGKey(0),
                              (B, H, args.width, cfg.in_dim), jnp.bfloat16)
        t = jnp.full((B,), 500, jnp.int32)
        cond = jax.random.normal(jax.random.PRNGKey(1), (B, 512),
                                 jnp.bfloat16)
        for mode, fused in modes.items():
            c = dataclasses.replace(cfg, fused_kernels=fused)
            model = ConditionedUnet(c, dtype=jnp.bfloat16)
            params = model.init(jax.random.PRNGKey(2),
                                x[:1], t[:1], cond[:1])["params"]
            fwd = jax.jit(
                lambda p_, x_, t_, c_: model.apply({"params": p_}, x_, t_,
                                                   c_))
            fwd(params, x, t, cond).block_until_ready()
            ms = device_time_ms(lambda: fwd(params, x, t, cond), iters=5)
            print(json.dumps({"batch": B, "mode": mode,
                              "ms": round(ms, 2),
                              "ms_per_sample": round(ms / B, 3)}),
                  flush=True)


if __name__ == "__main__":
    main()
