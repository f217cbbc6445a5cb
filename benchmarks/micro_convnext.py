"""Microbenchmark: fused ConvNeXt block kernel vs XLA at U-Net shapes.

Compares the XLA reference body at the model's REAL channel dims (the
current cost) against the fused Pallas kernel at 128-padded dims (the
channel-padded-at-rest execution plan), per U-Net level at CFG batch 128.

Run: cd /root/repo && python -u -m benchmarks.micro_convnext
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from benchmarks.device_time import device_time_ms
from diffusynth_tpu.ops.fused_block import (
    _pallas_forward, convnext_body_reference)


def pad_to(v: int, m: int = 128) -> int:
    return (v + m - 1) // m * m


def make_args(key, B, H, W, C, D, Co, dtype=jnp.bfloat16):
    ks = jax.random.split(key, 12)
    sc = 0.05
    return dict(
        h=jax.random.normal(ks[0], (B, H, W, C), dtype),
        t=(jax.random.normal(ks[1], (B, C), dtype) * 0.1),
        xres=jax.random.normal(ks[2], (B, H, W, C), dtype),
        g1s=jnp.ones((C,), jnp.float32),
        g1b=jnp.zeros((C,), jnp.float32),
        w1=jax.random.normal(ks[5], (3, 3, C, D), jnp.float32) * sc,
        b1=jnp.zeros((D,), jnp.float32),
        g2s=jnp.ones((D,), jnp.float32),
        g2b=jnp.zeros((D,), jnp.float32),
        w2=jax.random.normal(ks[9], (3, 3, D, Co), jnp.float32) * sc,
        b2=jnp.zeros((Co,), jnp.float32),
    )


def main():
    print("devices:", jax.devices(), flush=True)
    B = 128
    # (name, H, W, C, D, Co) — real dims per level (down path sites).
    sites = [
        ("L0 128x64 96->192->96", 128, 64, 96, 192, 96),
        ("L1  64x32 96->384->192", 64, 32, 96, 384, 192),
        ("L2  32x16 192->768->384", 32, 16, 192, 768, 384),
        ("mid 16x8  384->768->384", 16, 8, 384, 768, 384),
    ]
    key = jax.random.PRNGKey(0)
    for name, H, W, C, D, Co in sites:
        print(f"\n=== {name}  B={B} ===", flush=True)
        a = make_args(key, B, H, W, C, D, Co)
        has_res = C != Co
        wres = (jax.random.normal(key, (1, 1, C, Co), jnp.float32) * 0.05
                if has_res else None)
        bres = jnp.zeros((Co,), jnp.float32) if has_res else None

        ref = jax.jit(lambda a, wres=wres, bres=bres: convnext_body_reference(
            a["h"], a["t"], a["xres"], a["g1s"], a["g1b"], a["w1"], a["b1"],
            a["g2s"], a["g2b"], a["w2"], a["b2"], wres, bres))
        ms = device_time_ms(lambda: ref(a), iters=10)
        print(f"  xla reference (real dims)      {ms:8.3f} ms", flush=True)

        # Padded I/O dims, REAL hidden dim (D never leaves VMEM).
        Cp, Dp, Cop = pad_to(C), D, pad_to(Co)
        ap = make_args(key, B, H, W, Cp, Dp, Cop)
        wresp = (jax.random.normal(key, (1, 1, Cp, Cop), jnp.float32) * 0.05
                 if has_res else None)
        bresp = jnp.zeros((Cop,), jnp.float32) if has_res else None

        refp = jax.jit(lambda a, w=wresp, b=bresp: convnext_body_reference(
            a["h"], a["t"], a["xres"], a["g1s"], a["g1b"], a["w1"], a["b1"],
            a["g2s"], a["g2b"], a["w2"], a["b2"], w, b))
        ms = device_time_ms(lambda: refp(ap), iters=10)
        print(f"  xla reference (padded dims)    {ms:8.3f} ms", flush=True)

        # Same n as the padded reference (whose padded lanes are random,
        # not zero) so the numeric check is apples-to-apples; real-n
        # padded-zero equivalence is pinned by tests/test_fused_block.py.
        fused = jax.jit(lambda a, w=wresp, b=bresp: _pallas_forward(
            a["h"], a["t"], a["xres"], a["g1s"], a["g1b"], a["w1"], a["b1"],
            a["g2s"], a["g2b"], a["w2"], a["b2"], w, b,
            H=H, W=W, norm=True, eps=1e-5,
            n1=H * W * Cp, n2=H * W * Dp, interpret=False))
        try:
            ms = device_time_ms(lambda: fused(ap), iters=10)
            flops = B * H * W * (9 * Cp * Dp + 9 * Dp * Cop
                                 + (Cp * Cop if has_res else 0)) * 2
            print(f"  FUSED pallas (padded dims)     {ms:8.3f} ms  "
                  f"({flops / (ms / 1e3) / 1e12:.0f} TFLOP/s MXU)",
                  flush=True)
            # numeric check vs padded reference
            import numpy as np
            r = np.asarray(refp(ap), np.float32)
            g = np.asarray(fused(ap), np.float32)
            print(f"  max-err vs padded ref: {np.abs(r - g).max():.3e}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  FUSED pallas FAILED: {type(e).__name__}: {e}",
                  flush=True)

        # bigmm conv mode (single chunked matmul + shifted adds).
        import os

        os.environ["DIFFUSYNTH_CONV_MODE"] = "bigmm"
        try:
            fused2 = jax.jit(lambda a, w=wresp, b=bresp: _pallas_forward(
                a["h"], a["t"], a["xres"], a["g1s"], a["g1b"], a["w1"],
                a["b1"], a["g2s"], a["g2b"], a["w2"], a["b2"], w, b,
                H=H, W=W, norm=True, eps=1e-5,
                n1=H * W * Cp, n2=H * W * Dp, interpret=False))
            ms = device_time_ms(lambda: fused2(ap), iters=10)
            print(f"  FUSED pallas (bigmm)           {ms:8.3f} ms",
                  flush=True)
            import numpy as np
            g2 = np.asarray(fused2(ap), np.float32)
            print(f"  bigmm max-err vs padded ref: "
                  f"{np.abs(np.asarray(refp(ap), np.float32) - g2).max():.3e}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  bigmm FAILED: {type(e).__name__}: {e}", flush=True)
        finally:
            os.environ.pop("DIFFUSYNTH_CONV_MODE", None)


if __name__ == "__main__":
    main()
