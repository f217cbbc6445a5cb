"""Full U-Net CFG forward (batch 128, width 64): fused kernels vs XLA.

The sampling scan's hot body. Compares UNetConfig(fused_kernels=None)
(auto Pallas dispatch) against fused_kernels=False (pre-fusion XLA path),
with numerics cross-check.

Run: cd /root/repo && python -u -m benchmarks.micro_unet
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.device_time import device_time_ms
from diffusynth_tpu.configs import UNetConfig
from diffusynth_tpu.nn.unet import ConditionedUnet


def main():
    print("devices:", jax.devices(), flush=True)
    B, H, W = 128, 128, 64
    cfg = UNetConfig()
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, W, cfg.in_dim), jnp.bfloat16)
    t = jnp.full((B,), 500, jnp.int32)
    cond = jax.random.normal(jax.random.PRNGKey(1), (B, 512), jnp.bfloat16)

    results = {}
    for fused in (False, None):
        c = dataclasses.replace(cfg, fused_kernels=fused)
        model = ConditionedUnet(c, dtype=jnp.bfloat16)
        params = model.init(jax.random.PRNGKey(2),
                            x[:1], t[:1], cond[:1])["params"]
        fwd = jax.jit(lambda p, x, t, c: model.apply({"params": p}, x, t, c))
        out = fwd(params, x, t, cond)
        out.block_until_ready()
        ms, top = device_time_ms(lambda: fwd(params, x, t, cond), iters=5,
                                 breakdown=True)
        name = "fused-auto" if fused is None else "xla-only"
        results[name] = (ms, np.asarray(out[:2], np.float32))
        print(f"\n{name}: {ms:.2f} ms / forward", flush=True)
        cats = {}
        for opname, t_ms in top:
            if "custom-call" in opname or "tpu_custom_call" in opname:
                c = "pallas"
            elif "convolution" in opname:
                c = "convolution"
            elif "convert_reduce" in opname or "reduce" in opname:
                c = "reduce(GN stats)"
            elif "copy" in opname:
                c = "copy"
            elif "fusion" in opname:
                c = "fusion(elementwise)"
            else:
                c = "other"
            cats[c] = cats.get(c, 0.0) + t_ms
        for c, t_ms in sorted(cats.items(), key=lambda kv: -kv[1]):
            print(f"   {t_ms:8.2f} ms  {c}", flush=True)
        for opname, t_ms in top[:12]:
            print(f"   {t_ms:7.3f} ms  {opname[:110]}", flush=True)

    a = results["xla-only"][1]
    b = results["fused-auto"][1]
    print("\nmax |fused - xla|:", np.abs(a - b).max(),
          " (values span", float(np.abs(a).max()), ")", flush=True)
    print(f"speedup: {results['xla-only'][0] / results['fused-auto'][0]:.2f}x",
          flush=True)


if __name__ == "__main__":
    main()
