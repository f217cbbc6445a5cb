"""On-chip convergence smoke (VERDICT r1 #8): really TRAIN, not one step.

Runs a few hundred diffusion + VQGAN iterations on synthetic data on the
real TPU, logging loss curves to runs/ (committed), writing checkpoints
mid-run, and verifying a mid-run restore resumes at the saved step with
matching parameters before continuing.

Run: cd /root/repo && python -u -m benchmarks.convergence_smoke
"""

from __future__ import annotations

import time

import jax
import numpy as np

from diffusynth_tpu.configs import (AppConfig, DiffusionTrainConfig,
                                    VQGANTrainConfig)
from diffusynth_tpu.train import (Checkpointer, SyntheticNSynthDataset,
                                  data_iterator, train_diffusion_model,
                                  train_vqgan)
from diffusynth_tpu.train.logging import MetricLogger
from diffusynth_tpu.train.run import _condition_lookup

DIFF_ITERS = 300
DIFF_RESUME_ITERS = 50
VQGAN_ITERS = 200
MODELS_DIR = "runs/r2_smoke/models"


def smoke_diffusion(app: AppConfig):
    a = app.audio
    print("== diffusion smoke: production U-Net, synthetic latents, "
          f"b8 x {DIFF_ITERS} iters", flush=True)
    ds = SyntheticNSynthDataset(
        n=256, shape=(a.latent_height, a.vae_scale * 16, a.channels))
    cfg = DiffusionTrainConfig(max_iter=DIFF_ITERS, save_steps=100,
                               model_name="r2_smoke_unet")
    lookup = _condition_lookup(app.unet.label_emb_dim)
    uncond = np.zeros(app.unet.label_emb_dim, np.float32)
    ckpt = Checkpointer(MODELS_DIR)
    logger = MetricLogger("runs/r2_smoke/unet")
    t0 = time.time()
    params, _ = train_diffusion_model(
        app.unet, cfg, data_iterator(ds, cfg.batch_size, seed=0),
        lookup, uncond, checkpointer=ckpt, logger=logger, seed=0)
    dt = time.time() - t0
    print(f"   {DIFF_ITERS} iters in {dt:.0f}s wall "
          f"({DIFF_ITERS/dt:.2f} steps/s incl. compile)", flush=True)

    # Mid-run restore: load the checkpoint written at step 300 and resume.
    tmpl = {"variables": params, "step": 0}
    restored = ckpt.restore("r2_smoke_unet", "UNet", tmpl)
    assert restored["step"] == DIFF_ITERS, restored["step"]
    r0 = jax.tree_util.tree_leaves(restored["variables"])[0]
    p0 = jax.tree_util.tree_leaves(params)[0]
    assert np.allclose(np.asarray(r0), np.asarray(p0)), "restore mismatch"
    print(f"   restore OK at step {restored['step']}; resuming "
          f"{DIFF_RESUME_ITERS} more iters", flush=True)
    cfg2 = cfg.replace(max_iter=DIFF_RESUME_ITERS)
    train_diffusion_model(
        app.unet, cfg2, data_iterator(ds, cfg.batch_size, seed=1),
        lookup, uncond, init_variables=restored["variables"],
        logger=MetricLogger("runs/r2_smoke/unet_resumed"), seed=1)


def smoke_vqgan(app: AppConfig):
    a = app.audio
    print(f"== VQGAN smoke: production config, synthetic STFT+, "
          f"b4 x {VQGAN_ITERS} iters", flush=True)
    ds = SyntheticNSynthDataset(
        n=128, shape=(a.freq_resolution, a.time_resolution, 3))
    cfg = VQGANTrainConfig(max_iter=VQGAN_ITERS, save_steps=100,
                           model_name="r2_smoke_vqgan")
    t0 = time.time()
    train_vqgan(app.vqgan, cfg, data_iterator(ds, cfg.batch_size, seed=0),
                checkpointer=Checkpointer(MODELS_DIR),
                logger=MetricLogger("runs/r2_smoke/vqgan"), seed=0)
    dt = time.time() - t0
    print(f"   {VQGAN_ITERS} iters in {dt:.0f}s wall", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    app = AppConfig()
    smoke_diffusion(app)
    smoke_vqgan(app)
    print("SMOKE_DONE", flush=True)


if __name__ == "__main__":
    main()
