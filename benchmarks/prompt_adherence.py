"""Prompt adherence: does the text condition steer the audio? (VERDICT r4
task 3 — the r3/r4 caveat was conditional consistency ~= chance on the
800-iter checkpoint.)

Protocol (all on-chip, production geometry):

  1. Restore the r5 U-Net — 20k iters, weight EMA, trained on the
     'template' synthetic distribution where create_key (and hence the
     hash text embedding) maps 1:1 to a distinct per-instrument spatial
     pattern (train/data.py::SyntheticNSynthDataset class_signal).
  2. Train (or restore) a 16-way timbre-encoder classifier on the same
     distribution; report its accuracy on the dataset (the structural
     ceiling — with the template signal it should be ~1.0, making the
     consistency numbers interpretable at the full 16-way task).
  3. Conditional consistency: sample N=64 (4 per instrument, CFG 6,
     ddim-50, one batch launch), classify, report top-1 agreement with
     the conditioned instrument + mean posterior mass. Chance = 1/16.
  4. Prompt-swap A/B: regenerate from the IDENTICAL initial noise with
     conditions rotated one instrument forward. If text steers the
     output, the classifier must follow the CONDITION, not the noise,
     and the A/B latents must differ.

Run: cd /root/repo && python -u -m benchmarks.prompt_adherence
     [--ckpt-root runs/r5_trained/models --ckpt-name r5 --live-weights]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import numpy as np

CKPT_ROOT = "runs/r5_trained/models"
CKPT_NAME = "r5"
TE_ROOT = "runs/r5_adherence/models"
TE_NAME = "r5te"
N = 64
TE_ITERS = 400
SEED = 11
CFG_SCALE = 6.0
STEPS = 50


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt-root", default=CKPT_ROOT)
    p.add_argument("--ckpt-name", default=CKPT_NAME)
    p.add_argument("--live-weights", action="store_true",
                   help="use the live UNet role instead of UNet_ema")
    p.add_argument("--n", type=int, default=N)
    p.add_argument("--steps", type=int, default=STEPS)
    p.add_argument("--quantize", default="int8", choices=["int8", "none"],
                   help="U-Net numerics (int8 = the production default)")
    p.add_argument("--cfg", type=float, default=CFG_SCALE)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from diffusynth_tpu.configs import AppConfig, TimbreEncoderConfig, \
        TimbreTrainConfig
    from diffusynth_tpu.diffusion.schedule import respaced_timesteps
    from diffusynth_tpu.nn.timbre import TimbreEncoder
    from diffusynth_tpu.pipelines import DiffuSynthRuntime
    from diffusynth_tpu.text import CachedTextEncoder, HashTextEncoder
    from diffusynth_tpu.train import (SyntheticNSynthDataset, data_iterator,
                                      train_timbre_encoder)
    from diffusynth_tpu.train.checkpoints import Checkpointer
    from diffusynth_tpu.train.logging import MetricLogger
    from diffusynth_tpu.train.run import _condition_lookup

    app = AppConfig()
    if args.quantize == "int8":
        app = dataclasses.replace(
            app, unet=dataclasses.replace(app.unet, quantize="int8"))
    a = app.audio
    width = a.vae_scale * 16                 # training width (64)
    ds = SyntheticNSynthDataset(
        n=256, shape=(a.latent_height, width, a.channels),
        class_signal="template")

    # --- 16-way classifier on the template distribution ------------------
    te_cfg = TimbreEncoderConfig(
        input_dim=a.latent_height * a.channels, num_instrument_classes=16)
    te = TimbreEncoder(te_cfg)
    ckpt = Checkpointer(TE_ROOT)
    template = jax.jit(te.init)(
        jax.random.key(0),
        jnp.zeros((1, a.latent_height, width, a.channels)))
    if ckpt.exists(TE_NAME, "timbre_encoder"):
        te_params = ckpt.restore(
            TE_NAME, "timbre_encoder",
            {"variables": template, "step": 0})["variables"]
        print(f"[te] restored {TE_ROOT}/{TE_NAME}", flush=True)
    else:
        cfg = TimbreTrainConfig(max_iter=TE_ITERS, save_steps=TE_ITERS,
                                model_name=TE_NAME, steps_per_dispatch=8)
        t0 = time.time()
        te_params, _ = train_timbre_encoder(
            te_cfg, cfg, data_iterator(ds, cfg.batch_size, seed=3),
            checkpointer=ckpt,
            logger=MetricLogger("runs/r5_adherence/te",
                                use_tensorboard=False), seed=3)
        print(f"[te] trained {TE_ITERS} iters in {time.time()-t0:.0f}s",
              flush=True)
    te_apply = jax.jit(lambda p, x: te.apply(p, x))

    # Classifier ceiling: accuracy over the whole dataset.
    data, attrs = ds.get_batch(np.arange(len(ds)))
    _, logp, *_ = te_apply(te_params, jnp.asarray(data))
    true_inst = np.asarray([at["instrument"] for at in attrs])
    ceiling = float((np.argmax(np.asarray(logp), -1) == true_inst).mean())
    print(f"[te] 16-way dataset accuracy (structural ceiling): "
          f"{ceiling:.3f}", flush=True)

    # --- runtime with the trained r5 weights ------------------------------
    base_rt = DiffuSynthRuntime(
        app, text_encoder=CachedTextEncoder(HashTextEncoder(512)), seed=0)
    role = "UNet" if args.live_weights else "UNet_ema"
    ck = Checkpointer(args.ckpt_root)
    if not ck.exists(args.ckpt_name, role):
        role = "UNet"
    unet_params = ck.restore(args.ckpt_name, role,
                             {"variables": base_rt.unet_variables,
                              "step": 0})["variables"]
    print(f"restored {args.ckpt_root}/{args.ckpt_name}_{role}", flush=True)
    rt = DiffuSynthRuntime(
        app, unet_variables=unet_params,
        vqgan_variables=base_rt.vqgan_variables,
        text_encoder=CachedTextEncoder(HashTextEncoder(512)), seed=0)

    # --- conditions: 4 samples per instrument, spanning all 16 -----------
    # Draw dataset indices so each row's attributes carry its instrument's
    # 1:1 create_key.
    by_inst = {}
    for i in range(len(ds)):
        by_inst.setdefault(int(ds._instrument[i]), []).append(i)
    idx = []
    per = args.n // 16
    for inst in range(16):
        idx.extend((by_inst[inst] * per)[:per])
    _, attrs = ds.get_batch(np.asarray(idx))
    cond_inst = np.asarray([at["instrument"] for at in attrs])
    lookup = _condition_lookup(app.unet.label_emb_dim)
    cond = jnp.asarray(lookup(attrs), jnp.float32)
    uncond = np.zeros(app.unet.label_emb_dim, np.float32)

    d = app.diffusion
    s = rt.make_sampler()
    s.respace(list(respaced_timesteps(d.timesteps, args.steps)))
    s.activate_classifier_free_guidance(args.cfg, uncond)

    # Shared noise template: one train-width row per sample, fixed seed —
    # reused bit-identically for the swap run.
    template_noise = jax.random.normal(
        jax.random.key(SEED),
        (args.n, d.height, d.train_width, d.channels))
    shape = (args.n, a.latent_height, width, a.channels)

    def classify(latents):
        _, logp, *_ = te_apply(te_params, latents)
        return np.asarray(logp)

    t0 = time.time()
    lat_a, _ = s.sample(rt.unet_variables, shape, jax.random.key(SEED),
                        condition=cond, sampler="ddim",
                        initial_noise=template_noise)
    logp_a = classify(lat_a)
    pred_a = np.argmax(logp_a, -1)
    top1 = float((pred_a == cond_inst).mean())
    mass = float(np.exp(logp_a)[np.arange(args.n), cond_inst].mean())

    # --- prompt swap: identical noise, conditions rotated one instrument -
    swap_inst = (cond_inst + 1) % 16
    swap_attrs = []
    for inst in swap_inst:
        j = by_inst[int(inst)][0]
        swap_attrs.append(ds.get_batch(np.asarray([j]))[1][0])
    cond_b = jnp.asarray(lookup(swap_attrs), jnp.float32)
    lat_b, _ = s.sample(rt.unet_variables, shape, jax.random.key(SEED),
                        condition=cond_b, sampler="ddim",
                        initial_noise=template_noise)
    logp_b = classify(lat_b)
    pred_b = np.argmax(logp_b, -1)
    swap_top1 = float((pred_b == swap_inst).mean())
    followed_noise = float((pred_b == cond_inst).mean())
    lat_gap = float(np.mean(np.abs(np.asarray(lat_a, np.float32)
                                   - np.asarray(lat_b, np.float32))))
    wall = time.time() - t0

    report = {
        "ckpt": f"{args.ckpt_root}/{args.ckpt_name}_{role}",
        "numerics": args.quantize,
        "sampler": f"ddim-{args.steps}", "cfg": args.cfg, "n": args.n,
        "classifier_ceiling_16way": round(ceiling, 3),
        "chance": round(1 / 16, 4),
        "consistency_top1": round(top1, 3),
        "consistency_mass": round(mass, 3),
        "swap_top1_follows_condition": round(swap_top1, 3),
        "swap_top1_follows_noise": round(followed_noise, 3),
        "swap_latent_mean_abs_gap": round(lat_gap, 4),
        "wall_s": round(wall, 1),
    }
    print(json.dumps(report))
    verdict = (top1 > 0.5 and swap_top1 > 0.5
               and swap_top1 > followed_noise)
    print(f"PROMPT ADHERENCE {'PROVEN' if verdict else 'NOT PROVEN'}: "
          f"top-1 consistency {top1:.3f} (chance 0.0625), swap follows "
          f"condition {swap_top1:.3f} vs noise {followed_noise:.3f}")
    return report


if __name__ == "__main__":
    main()
