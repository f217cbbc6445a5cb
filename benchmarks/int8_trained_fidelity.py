"""int8 trajectory stability with TRAINED weights + bf16-training smoke.

docs/PARITY_E2E.md's int8 caveat: with random weights any per-step
perturbation (including bf16-vs-f32) compounds to full divergence over a
DDIM chain, so the end-to-end MAE budget is only meaningful with trained
weights. No pretrained checkpoints are obtainable here (no network), but
we can TRAIN one: this benchmark trains the production U-Net on
synthetic latents on-chip (with the train-config's default bfloat16
compute — doubling as the convergence smoke for that default), then runs
the identical 50-step CFG sampler with bf16 vs int8 U-Net convs from the
same seed and reports how far the trajectories actually drift with a
trained (contracting) denoiser, at the latent and spectrogram stages.

Run: cd /root/repo && python -u -m benchmarks.int8_trained_fidelity
"""

from __future__ import annotations

import dataclasses
import time

import jax
import numpy as np

from diffusynth_tpu.configs import AppConfig, DiffusionTrainConfig

TRAIN_ITERS = 800
BATCH = 4
STEPS = 50
CKPT_ROOT = "runs/r3_trained/models"   # reused by the dpmpp-quality and
CKPT_NAME = "r3"                       # LoRA-learning round-3 tasks


def main():
    import jax.numpy as jnp

    from diffusynth_tpu.pipelines import DiffuSynthRuntime, Text2SoundPipeline
    from diffusynth_tpu.text import CachedTextEncoder, HashTextEncoder
    from diffusynth_tpu.train import (SyntheticNSynthDataset, data_iterator,
                                      train_diffusion_model)
    from diffusynth_tpu.train.logging import MetricLogger
    from diffusynth_tpu.train.run import _condition_lookup

    app = AppConfig()
    a = app.audio

    # --- 1) Train (bf16 compute, the config default) ----------------------
    from diffusynth_tpu.train.checkpoints import Checkpointer

    ds = SyntheticNSynthDataset(
        n=256, shape=(a.latent_height, a.vae_scale * 16, a.channels))
    cfg = DiffusionTrainConfig(max_iter=TRAIN_ITERS, save_steps=10**9,
                               model_name="int8_fid")
    assert cfg.compute_dtype == "bfloat16"
    lookup = _condition_lookup(app.unet.label_emb_dim)
    uncond = np.zeros(app.unet.label_emb_dim, np.float32)
    logger = MetricLogger("runs/int8_fidelity", use_tensorboard=False)
    t0 = time.time()
    params, _ = train_diffusion_model(
        app.unet, cfg, data_iterator(ds, cfg.batch_size, seed=0),
        lookup, uncond, logger=logger, seed=0)
    print(f"trained {TRAIN_ITERS} iters (bf16 compute) in "
          f"{time.time()-t0:.0f}s wall", flush=True)
    ckpt = Checkpointer(CKPT_ROOT)
    ckpt.save(CKPT_NAME, "UNet", {"variables": params,
                                  "step": TRAIN_ITERS})
    ckpt.save_hyperparameters(CKPT_NAME, "UNet", dataclasses.asdict(app.unet))
    print(f"checkpoint saved to {CKPT_ROOT}/{CKPT_NAME}_UNet", flush=True)
    import json
    losses = [json.loads(l) for l in open("runs/int8_fidelity/metrics.jsonl")]
    losses = [r for r in losses if r["name"] == "loss_100"]
    print("loss_100 curve:", [(r["step"], round(r["value"], 4))
                              for r in losses], flush=True)

    # --- 2) Sample the same seed with bf16 vs int8 U-Net convs ------------
    outs = {}
    for quant in (None, "int8"):
        qapp = dataclasses.replace(
            app, unet=dataclasses.replace(app.unet, quantize=quant))
        rt = DiffuSynthRuntime(
            qapp, unet_variables=params,
            text_encoder=CachedTextEncoder(HashTextEncoder(512)), seed=0)
        pipe = Text2SoundPipeline(rt)
        res = pipe("a bright organ", "noise", batchsize=BATCH,
                   duration_sec=3.0, steps=STEPS, cfg=6.0, seed=7,
                   return_audio=False)
        outs[quant or "bf16"] = (np.asarray(res.latents, np.float32),
                                 np.asarray(res.spectrograms, np.float32))

    lat_b, spec_b = outs["bf16"]
    lat_i, spec_i = outs["int8"]
    lat_mae = float(np.abs(lat_b - lat_i).mean())
    lat_scale = float(np.abs(lat_b).mean())
    spec_mae = float(np.abs(spec_b - spec_i).mean())
    spec_scale = float(np.abs(spec_b).mean())
    print(f"latent MAE int8-vs-bf16 (trained weights, {STEPS}-step CFG "
          f"DDIM): {lat_mae:.3e} (scale {lat_scale:.3e}, rel "
          f"{lat_mae/lat_scale:.2%})", flush=True)
    print(f"spectrogram MAE: {spec_mae:.3e} (scale {spec_scale:.3e}, rel "
          f"{spec_mae/spec_scale:.2%}; BASELINE budget 1e-3 abs)",
          flush=True)


if __name__ == "__main__":
    main()
