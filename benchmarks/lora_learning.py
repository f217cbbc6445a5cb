"""LoRA learning demonstration: the adapter actually adapts.

Round 2 verified LoRA mechanically (identity at init, adapter-only
updates, merge equivalence, DP-mesh equality) but never showed it
LEARNING. This run does, end to end, on-chip:

  1. Base model = the r3 trained production U-Net
     (benchmarks/int8_trained_fidelity.py, runs/r3_trained — trained on
     the SyntheticNSynthDataset distribution).
  2. Fine-tune TARGET = a deliberately shifted distribution (channel-0
     offset negated, channel 2 pushed +0.7) the base model has never
     seen.
  3. Train an adapter (rank 8, base frozen) for LORA_ITERS steps —
     the loss curve must come down (runs/r3_lora/metrics.jsonl).
  4. Reload the adapter via from_pretrained(lora_name=...) (the
     production load path, sidecar included) and sample base vs
     adapted from the same seed.
  5. The adapted samples' channel statistics must move toward the
     target distribution; before/after WAV + latent artifacts go to
     runs/r3_lora.

Beyond-reference feature (the reference's only adaptation path is
re-running the full training notebooks, colab_notebooks/*.ipynb);
the bar is docs/MIGRATION.md's claim that fine-tuning is supported.

Run: cd /root/repo && python -u -m benchmarks.lora_learning
"""

from __future__ import annotations

import json
import os
import time

import jax
import numpy as np

from diffusynth_tpu.configs import AppConfig, DiffusionTrainConfig

from benchmarks.int8_trained_fidelity import CKPT_NAME, CKPT_ROOT

LORA_ITERS = 400
RANK = 8
OUT = "runs/r3_lora"


class ShiftedDataset:
    """SyntheticNSynthDataset with a distribution shift the base model
    never saw: channel-0 class offsets negated, channel 2 lifted +0.7."""

    def __init__(self, inner):
        self.inner = inner

    def __len__(self):
        return len(self.inner)

    def get_batch(self, indices):
        data, attrs = self.inner.get_batch(indices)
        data = data.copy()
        data[..., 0] = -data[..., 0]
        data[..., 2] += 0.7
        return data, attrs


def channel_stats(latents: np.ndarray) -> np.ndarray:
    """Per-channel mean over batch+space — the signature the shift moves."""
    return np.asarray(latents, np.float32).mean(axis=(0, 1, 2))


def main():
    from scipy.io import wavfile

    from diffusynth_tpu.pipelines import DiffuSynthRuntime, Text2SoundPipeline
    from diffusynth_tpu.text import CachedTextEncoder, HashTextEncoder
    from diffusynth_tpu.train import (SyntheticNSynthDataset, data_iterator,
                                      train_diffusion_lora)
    from diffusynth_tpu.train.checkpoints import Checkpointer
    from diffusynth_tpu.train.logging import MetricLogger
    from diffusynth_tpu.train.run import _condition_lookup

    app = AppConfig()
    a = app.audio
    os.makedirs(OUT, exist_ok=True)

    # --- base weights -----------------------------------------------------
    text = CachedTextEncoder(HashTextEncoder(512))
    base_rt = DiffuSynthRuntime(app, text_encoder=text, seed=0)
    ckpt = Checkpointer(CKPT_ROOT)
    base = ckpt.restore(CKPT_NAME, "UNet",
                        {"variables": base_rt.unet_variables,
                         "step": 0})["variables"]
    print(f"base = {CKPT_ROOT}/{CKPT_NAME}_UNet", flush=True)

    # --- adapter-only fine-tune on the shifted target ---------------------
    ds = ShiftedDataset(SyntheticNSynthDataset(
        n=256, shape=(a.latent_height, a.vae_scale * 16, a.channels)))
    target_data, _ = ds.get_batch(np.arange(64))
    cfg = DiffusionTrainConfig(max_iter=LORA_ITERS, batch_size=4,
                               save_steps=LORA_ITERS, model_name=CKPT_NAME)
    lookup = _condition_lookup(app.unet.label_emb_dim)
    t0 = time.time()
    lora, _ = train_diffusion_lora(
        app.unet, cfg, data_iterator(ds, cfg.batch_size, seed=1), lookup,
        np.zeros(app.unet.label_emb_dim, np.float32), base, rank=RANK,
        checkpointer=ckpt, logger=MetricLogger(OUT, use_tensorboard=False),
        seed=0)
    print(f"adapter trained {LORA_ITERS} iters in {time.time()-t0:.0f}s "
          f"wall", flush=True)
    losses = [json.loads(l) for l in open(f"{OUT}/metrics.jsonl")]
    curve = [(r["step"], round(r["value"], 4)) for r in losses
             if r["name"] == "loss_100"]
    print("adapter loss_100 curve:", curve, flush=True)
    assert curve[-1][1] < curve[0][1], "adapter loss did not decrease"

    n_ad = sum(int(np.prod(x.shape)) for x in
               jax.tree_util.tree_leaves(lora))
    n_base = sum(int(np.prod(np.shape(x))) for x in
                 jax.tree_util.tree_leaves(base))
    print(f"adapter params: {n_ad:,} ({n_ad / n_base:.2%} of base)",
          flush=True)

    # --- before/after sampling via the production load path ---------------
    outs = {}
    for tag, lora_name in (("base", None), ("lora", CKPT_NAME)):
        rt = DiffuSynthRuntime.from_pretrained(
            CKPT_ROOT, vqgan_name="none", unet_name=CKPT_NAME,
            lora_name=lora_name, text_encoder=text, seed=0)
        res = Text2SoundPipeline(rt)(
            "a bright organ", "noise", batchsize=4, duration_sec=3.0,
            steps=50, cfg=6.0, seed=11, return_audio=True)
        outs[tag] = res
        wavfile.write(f"{OUT}/{tag}_sample.wav", a.sample_rate,
                      np.asarray(res.audio[0]))
        print(f"{tag}: sampled + {OUT}/{tag}_sample.wav written", flush=True)

    tgt = channel_stats(target_data)
    st_base = channel_stats(np.asarray(outs["base"].latents))
    st_lora = channel_stats(np.asarray(outs["lora"].latents))
    d_base = float(np.abs(st_base - tgt).mean())
    d_lora = float(np.abs(st_lora - tgt).mean())
    print(f"target channel means: {np.round(tgt, 3).tolist()}")
    print(f"base sample channel means: {np.round(st_base, 3).tolist()} "
          f"(dist {d_base:.3f})")
    print(f"lora sample channel means: {np.round(st_lora, 3).tolist()} "
          f"(dist {d_lora:.3f})")
    np.savez(f"{OUT}/channel_stats.npz", target=tgt, base=st_base,
             lora=st_lora)
    assert d_lora < d_base, (
        "adapter did not move samples toward the target distribution")
    print(f"PASS: adapter moved sample distribution toward the target "
          f"({d_base:.3f} -> {d_lora:.3f})", flush=True)


if __name__ == "__main__":
    main()
