"""Control experiment for int8 e2e fidelity: is the 50-step DDIM chain
pointwise-chaotic even in bf16-vs-f32, with TRAINED weights?

benchmarks/int8_trained_fidelity.py measured int8-vs-bf16 latent MAE
7.1e-2 (5.7% rel) on the r3 trained checkpoint — far above the 1e-3
budget. This script decides what that number MEANS by comparing three
numerics of the SAME trained sampler from the SAME seed:

    f32   : compute_dtype float32 (reference numerics)
    bf16  : compute_dtype bfloat16 (production default)
    int8  : bf16 + W8A8 U-Net convs (ops/quant.py)

If |bf16 - f32| is the same order as |int8 - bf16|, any per-step
numerical perturbation compounds through the chain (chaotic trajectory,
trained or not) and pointwise MAE cannot distinguish int8 from the bf16
production default — the fidelity argument must then be made in output
space (per-sample spectral statistics / decode-tail MAE), which this
script also reports.

Reads the checkpoint written by int8_trained_fidelity (runs/r3_trained).
Run: cd /root/repo && python -u -m benchmarks.int8_control
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from diffusynth_tpu.configs import AppConfig

from benchmarks.int8_trained_fidelity import BATCH, CKPT_NAME, CKPT_ROOT, STEPS


def spectral_stats(spec: np.ndarray) -> np.ndarray:
    """Output-space summary per sample: mean log-magnitude per frequency
    band (8 bands) and per time quarter — robust to pointwise trajectory
    divergence, sensitive to actual quality/energy changes."""
    mag = np.abs(np.expm1(spec[..., 0]))          # (B, F, T)
    b, f, t = mag.shape
    bands = mag.reshape(b, 8, f // 8, t).mean((2, 3))      # (B, 8)
    quarters = mag.reshape(b, f, 4, t // 4).mean((1, 3))   # (B, 4)
    return np.concatenate([bands, quarters], axis=1)


def main():
    from diffusynth_tpu.pipelines import DiffuSynthRuntime, Text2SoundPipeline
    from diffusynth_tpu.text import CachedTextEncoder, HashTextEncoder
    from diffusynth_tpu.train.checkpoints import Checkpointer

    app = AppConfig()

    # Restore the trained checkpoint against a random-init template.
    base_rt = DiffuSynthRuntime(
        app, text_encoder=CachedTextEncoder(HashTextEncoder(512)), seed=0)
    ckpt = Checkpointer(CKPT_ROOT)
    params = ckpt.restore(CKPT_NAME, "UNet",
                          {"variables": base_rt.unet_variables,
                           "step": 0})["variables"]
    print(f"restored {CKPT_ROOT}/{CKPT_NAME}_UNet", flush=True)

    variants = {
        "f32": dataclasses.replace(app, compute_dtype="float32"),
        "bf16": app,
        "int8": dataclasses.replace(
            app, unet=dataclasses.replace(app.unet, quantize="int8")),
    }
    outs = {}
    for name, cfg in variants.items():
        rt = DiffuSynthRuntime(
            cfg, unet_variables=params,
            vqgan_variables=base_rt.vqgan_variables,
            text_encoder=CachedTextEncoder(HashTextEncoder(512)), seed=0)
        pipe = Text2SoundPipeline(rt)
        res = pipe("a bright organ", "noise", batchsize=BATCH,
                   duration_sec=3.0, steps=STEPS, cfg=6.0, seed=7,
                   return_audio=False)
        outs[name] = (np.asarray(res.latents, np.float32),
                      np.asarray(res.spectrograms, np.float32))
        print(f"{name}: sampled", flush=True)

    def mae(a, b):
        return float(np.abs(a - b).mean())

    lat_scale = float(np.abs(outs["f32"][0]).mean())
    print(f"\nlatent scale {lat_scale:.3e}; {STEPS}-step CFG DDIM, "
          f"trained weights, batch {BATCH}:")
    for pair in (("bf16", "f32"), ("int8", "bf16"), ("int8", "f32")):
        m = mae(outs[pair[0]][0], outs[pair[1]][0])
        print(f"  latent MAE {pair[0]}-vs-{pair[1]}: {m:.3e} "
              f"(rel {m / lat_scale:.2%})", flush=True)
    spec_scale = float(np.abs(outs["f32"][1]).mean())
    for pair in (("bf16", "f32"), ("int8", "bf16"), ("int8", "f32")):
        m = mae(outs[pair[0]][1], outs[pair[1]][1])
        print(f"  spec   MAE {pair[0]}-vs-{pair[1]}: {m:.3e} "
              f"(rel {m / spec_scale:.2%})", flush=True)

    # Output-space (distributional) comparison: band/quarter energies.
    stats = {k: spectral_stats(v[1]) for k, v in outs.items()}
    ref = np.abs(stats["f32"]).mean()
    for pair in (("bf16", "f32"), ("int8", "bf16"), ("int8", "f32")):
        d = float(np.abs(stats[pair[0]] - stats[pair[1]]).mean())
        print(f"  band-energy dist {pair[0]}-vs-{pair[1]}: {d:.3e} "
              f"(rel {d / ref:.2%})", flush=True)


if __name__ == "__main__":
    main()
