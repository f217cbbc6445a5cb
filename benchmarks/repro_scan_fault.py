"""Minimizer for the batch-64 unconditional sampling-scan device fault.

Round-1 finding (.claude/skills/verify/SKILL.md): the fused sampling scan
at unconditional batch-64 width-64 faults the chip (UNAVAILABLE "kernel
fault"); CFG batch-128 scans and single forwards are fine. This script
runs one configuration per invocation (a fault can take the process down)
so a driver loop can bisect.

Usage: python -m benchmarks.repro_scan_fault CASE
Cases: scan_b64_uncond, scan_b64_cond, scan_b64_uncond_noflash (fused
kernels off), scan_b32_uncond, fwd_b64_uncond, scan_b64_uncond_k2,
sampler_b64_uncond (full DiffSynthSampler path).
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np


def build(fused):
    import dataclasses

    from diffusynth_tpu.configs import UNetConfig
    from diffusynth_tpu.nn.unet import ConditionedUnet

    cfg = dataclasses.replace(UNetConfig(), fused_kernels=fused)
    model = ConditionedUnet(cfg, dtype=jnp.bfloat16)
    return model


def unet_scan(batch, cond, k, fused):
    model = build(fused)
    x = jnp.zeros((batch, 128, 64, 4), jnp.bfloat16)
    t = jnp.zeros((batch,), jnp.int32)
    c = jnp.zeros((batch, 512), jnp.bfloat16) if cond else None
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1], t[:1],
                                 None if c is None else c[:1])["params"]

    def loop(p, x0):
        def body(carry, _):
            eps = model.apply({"params": p}, carry, t, c)
            return carry - 0.1 * eps.astype(carry.dtype), ()
        out, _ = jax.lax.scan(body, x0, None, length=k)
        return out

    out = jax.jit(loop)(params, x)
    out.block_until_ready()
    return np.isfinite(np.asarray(out, np.float32)).all()


def unet_fwd(batch, cond, fused):
    model = build(fused)
    x = jnp.zeros((batch, 128, 64, 4), jnp.bfloat16)
    t = jnp.zeros((batch,), jnp.int32)
    c = jnp.zeros((batch, 512), jnp.bfloat16) if cond else None
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1], t[:1],
                                 None if c is None else c[:1])["params"]
    f = jax.jit(lambda p, x, t: model.apply({"params": p}, x, t, c))
    out = f(params, x, t)
    out.block_until_ready()
    return np.isfinite(np.asarray(out, np.float32)).all()


def sampler_b64_uncond():
    from diffusynth_tpu.configs import AppConfig
    from diffusynth_tpu.pipelines import DiffuSynthRuntime

    rt = DiffuSynthRuntime(AppConfig(), loop_mode="scan")
    s = rt.make_sampler()
    s.respace(list(range(0, 1000, 200)))  # 5 steps
    latents, _ = s.sample(rt.unet_variables, (64, 128, 64, 4),
                          jax.random.key(0), condition=None, sampler="ddim")
    return np.isfinite(np.asarray(latents, np.float32)).all()


CASES = {
    "scan_b64_uncond": lambda: unet_scan(64, False, 5, None),
    "scan_b64_cond": lambda: unet_scan(64, True, 5, None),
    "scan_b64_uncond_nofused": lambda: unet_scan(64, False, 5, False),
    "scan_b32_uncond": lambda: unet_scan(32, False, 5, None),
    "scan_b48_uncond": lambda: unet_scan(48, False, 5, None),
    "scan_b96_uncond": lambda: unet_scan(96, False, 5, None),
    "scan_b128_uncond": lambda: unet_scan(128, False, 5, None),
    "scan_b64_uncond_k2": lambda: unet_scan(64, False, 2, None),
    "fwd_b64_uncond": lambda: unet_fwd(64, False, None),
    "sampler_b64_uncond": sampler_b64_uncond,
}


def main():
    case = sys.argv[1]
    print(f"devices: {jax.devices()}; case {case}", flush=True)
    ok = CASES[case]()
    print(f"RESULT {case}: {'OK finite' if ok else 'NONFINITE'}", flush=True)


if __name__ == "__main__":
    main()
