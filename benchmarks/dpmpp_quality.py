"""dpmpp quality, second leg: OUTPUT-space error on a TRAINED checkpoint.

Round 2's 1.82x quality-matched claim for DPM-Solver++ rested solely on
ODE-trajectory error (benchmarks/sampler_convergence.py, random weights).
This run re-grounds it where it matters: decoded spectrograms of the r3
TRAINED model (runs/r3_trained), comparing each practical sampler config
against a dense-step reference solution of the SAME probability-flow ODE
from the SAME starting noise:

    reference: ddim-200 (the discretization-converged solution)
    candidates: ddim-50 (the headline), ddim-20 (UI default),
                dpmpp-15 / dpmpp-20 / dpmpp-25

Metrics per candidate, batch 16, unconditional (the trained
distribution):
  * spectrogram MAE vs the dense solution (pointwise ODE
    discretization error at the output surface);
  * band-energy distribution distance (distributional leg, robust to
    pointwise divergence — same summary as benchmarks/int8_control.py).

The quality-matched step count for dpmpp is the smallest K whose both
metrics are <= ddim-50's. Sampler beaten: the reference has only
ddim/ddpm (/root/reference/model/DiffSynthSampler.py:296-345).

Run: cd /root/repo && python -u -m benchmarks.dpmpp_quality
"""

from __future__ import annotations

import jax
import numpy as np

from diffusynth_tpu.configs import AppConfig

from benchmarks.int8_control import spectral_stats
from benchmarks.int8_trained_fidelity import CKPT_NAME, CKPT_ROOT

BATCH = 16
CASES = [("ddim", 200), ("ddim", 50), ("ddim", 20),
         ("dpmpp", 15), ("dpmpp", 20), ("dpmpp", 25)]


def main():
    from diffusynth_tpu.diffusion.schedule import respaced_timesteps
    from diffusynth_tpu.pipelines import DiffuSynthRuntime
    from diffusynth_tpu.text import CachedTextEncoder, HashTextEncoder
    from diffusynth_tpu.train.checkpoints import Checkpointer

    app = AppConfig()
    a = app.audio
    rt = DiffuSynthRuntime(
        app, text_encoder=CachedTextEncoder(HashTextEncoder(512)), seed=0)
    ckpt = Checkpointer(CKPT_ROOT)
    rt.unet_variables = ckpt.restore(
        CKPT_NAME, "UNet", {"variables": rt.unet_variables,
                            "step": 0})["variables"]
    print(f"restored {CKPT_ROOT}/{CKPT_NAME}_UNet", flush=True)

    shape = (BATCH, a.latent_height, a.vae_scale * 16, a.channels)
    cond = np.zeros((BATCH, app.unet.label_emb_dim), np.float32)
    specs = {}
    for sampler, steps in CASES:
        s = rt.make_sampler()
        s.respace(list(respaced_timesteps(
            rt.config.diffusion.timesteps, steps)))
        latents, _ = s.sample(rt.unet_variables, shape, jax.random.key(3),
                              condition=cond, sampler=sampler)
        _, spec, _ = rt.decode_latents_full(latents, quantize=True)
        specs[(sampler, steps)] = np.asarray(spec, np.float32)
        print(f"{sampler}-{steps}: sampled", flush=True)

    ref = specs[("ddim", 200)]
    ref_stats = spectral_stats(ref)
    scale = float(np.abs(ref).mean())
    stat_scale = float(np.abs(ref_stats).mean())
    print(f"\nreference ddim-200; spectrogram scale {scale:.3e}; "
          f"batch {BATCH}, unconditional, trained weights")
    print(f"{'sampler':>10s} {'spec MAE':>12s} {'rel':>7s} "
          f"{'band dist':>12s} {'rel':>7s}")
    rows = {}
    for case, spec in specs.items():
        if case == ("ddim", 200):
            continue
        mae = float(np.abs(spec - ref).mean())
        sd = float(np.abs(spectral_stats(spec) - ref_stats).mean())
        rows[case] = (mae, sd)
        print(f"{case[0]}-{case[1]:<5d} {mae:12.3e} {mae/scale:6.2%} "
              f"{sd:12.3e} {sd/stat_scale:6.2%}", flush=True)

    mae50, sd50 = rows[("ddim", 50)]
    matched = [k for s, k in CASES if s == "dpmpp"
               and rows[("dpmpp", k)][0] <= mae50
               and rows[("dpmpp", k)][1] <= sd50]
    if matched:
        k = min(matched)
        print(f"\nquality-matched: dpmpp-{k} <= ddim-50 on both metrics "
              f"({50 / k:.2f}x fewer U-Net evaluations)", flush=True)
    else:
        print("\nno dpmpp config matched ddim-50 on both metrics "
              "(record as a measured negative)", flush=True)


if __name__ == "__main__":
    main()
