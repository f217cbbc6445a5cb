"""Scanned U-Net step (the sampler's real hot loop): fused vs XLA.

Scans the U-Net forward K times with params as loop invariants — matching
the jitted sampling scan, where XLA hoists parameter layout conversions out
of the loop (a standalone forward can't show this). Also prints the top
copy ops to attribute layout-churn.

Run: cd /root/repo && python -u -m benchmarks.micro_scan
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.device_time import device_time_ms
from diffusynth_tpu.configs import UNetConfig
from diffusynth_tpu.nn.unet import ConditionedUnet

K = 5


def main():
    import sys

    import os

    print("devices:", jax.devices(), flush=True)
    # MICRO_SCAN_BATCH: CFG-doubled batch (default 128 = user batch 64).
    B = int(os.environ.get("MICRO_SCAN_BATCH", "128"))
    H, W = 128, 64
    # MICRO_SCAN_UNET=tpu128: measure the MXU-tile-aligned preset
    # (configs.UNET_PRESETS; RESULTS_r2.md H11) instead of reference dims.
    preset = os.environ.get("MICRO_SCAN_UNET")
    if preset:
        from diffusynth_tpu.configs import UNET_PRESETS
        cfg = UNET_PRESETS[preset]
        print("unet preset:", preset, cfg.down_dims, flush=True)
    else:
        cfg = UNetConfig()
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, W, cfg.in_dim), jnp.bfloat16)
    t = jnp.full((B,), 500, jnp.int32)
    cond = jax.random.normal(jax.random.PRNGKey(1), (B, 512), jnp.bfloat16)

    results = {}
    variants = [
        ("xla-only", dict(fused_kernels=False)),
        ("fused", dict(fused_kernels=None)),
        ("int8", dict(fused_kernels=None, quantize="int8")),
    ]
    if len(sys.argv) > 1:   # run only the named variants
        want = set(sys.argv[1:])
        variants = [v for v in variants if v[0] in want]
    for name, overrides in variants:
        c = dataclasses.replace(cfg, **overrides)
        model = ConditionedUnet(c, dtype=jnp.bfloat16)
        # jitted init: unjitted flax init runs EAGERLY through the axon
        # tunnel (minutes) — see .claude/skills/verify/SKILL.md.
        params = jax.jit(model.init)(jax.random.PRNGKey(2),
                                     x[:1], t[:1], cond[:1])["params"]

        def step_scan(p, x0):
            def body(carry, _):
                eps = model.apply({"params": p}, carry, t, cond)
                # feed back (keeps shapes; mimics the DDIM update's reuse)
                return carry - 0.01 * eps.astype(carry.dtype), ()
            out, _ = jax.lax.scan(body, x0, None, length=K)
            return out

        fwd = jax.jit(step_scan)
        out = fwd(params, x)
        out.block_until_ready()
        ms, top = device_time_ms(lambda: fwd(params, x), iters=3,
                                 breakdown=True)
        results[name] = (ms / K, np.asarray(out[:2], np.float32))
        print(f"\n{name}: {ms / K:.2f} ms / step (scan of {K})", flush=True)
        cats = {}
        for opname, t_ms in top:
            # Classify by the op KIND on the RHS (operand names would
            # otherwise pollute, e.g. "%fusion(... %copy-done...)").
            rhs = opname.split(" = ", 1)[1] if " = " in opname else opname
            kind = rhs.split("(", 1)[0].rsplit(" ", 1)[-1]                 if "(" in rhs else rhs
            if kind == "custom-call":
                cat = "pallas/custom-call"
            elif kind in ("copy", "copy-start", "copy-done", "transpose",
                          "bitcast-convert"):
                cat = "copy/transpose"
            else:
                cat = kind
            cats[cat] = cats.get(cat, 0.0) + t_ms
        for cat, t_ms in sorted(cats.items(), key=lambda kv: -kv[1])[:10]:
            print(f"   {t_ms / K:8.2f} ms/step  {cat}", flush=True)
        print("  top ops:", flush=True)
        for opname, t_ms in top[2:22]:
            print(f"   {t_ms / K:7.3f} ms  {opname[:130]}", flush=True)

    if "xla-only" not in results:
        return
    base = results["xla-only"]
    for name in ("fused", "int8"):
        if name in results:
            print(f"\n{name}: max|diff vs xla| = "
                  f"{np.abs(base[1] - results[name][1]).max():.4f}, "
                  f"speedup {base[0] / results[name][0]:.2f}x", flush=True)


if __name__ == "__main__":
    main()
