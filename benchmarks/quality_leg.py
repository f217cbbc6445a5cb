"""The quality leg: Inception Score + multi-scale spectral distance over
numerics and samplers (VERDICT r3 task #2).

Round 3 justified the int8 default and the dpmpp-25 "quality-matched" claim
with pointwise spectrogram MAE (admitted chaotic, docs/PARITY_E2E.md) plus a
12-number band-energy summary. This benchmark replaces "probably fine" with
the reference's OWN training-time quality measure — the timbre-encoder
Inception Score (reference: model/diffusion.py:507-514, metrics.IS) — plus a
multi-scale spectral distance in output (waveform) space:

  1. Train a timbre-encoder classifier on the SAME synthetic latent
     distribution the r3 production U-Net was trained on
     (benchmarks/int8_trained_fidelity.py), or load it if already trained.
  2. For every config in {f32, bf16, int8} x {ddim-50, dpmpp-25, ddim-20}:
     sample N=64 latents from the r3 trained U-Net (one batch-64 launch,
     per-sample conditions spanning the training instruments, CFG 6),
     decode to waveforms.
  3. Report per config:
       - IS (instrument-posterior inception score, 4 splits, +/- std)
       - conditional consistency: agreement of the classifier's instrument
         GROUP posterior with the conditioned instrument's group (the
         synthetic dataset's learnable structure is instrument % 5)
       - MSSD: multi-scale log-spectral distance of the decoded waveforms
         vs the dense f32 ddim-200 solution from the same seed+conditions
         (the r3 dpmpp-leg convention, benchmarks/dpmpp_quality.py)

Decision rule (VERDICT): if IS(int8) < IS(bf16) materially (beyond split
std), revisit the int8 default and say so in PARITY_E2E/README.

Run: cd /root/repo && python -u -m benchmarks.quality_leg
     (TPU; ~10 compiles on a cold AOT cache. --fast cuts samplers to
      ddim-50 only for smoke runs.)
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from diffusynth_tpu.configs import (
    AppConfig,
    TimbreEncoderConfig,
    TimbreTrainConfig,
)

from benchmarks.int8_trained_fidelity import CKPT_NAME, CKPT_ROOT

N = 64                      # samples per config (VERDICT: N>=64)
TE_ITERS = 400              # timbre-encoder training iterations (the
                            # synthetic class structure saturates well
                            # before this; final accuracies are logged)
TE_CKPT_ROOT = "runs/r4_quality/models"
TE_CKPT_NAME = "r4te"
SAMPLERS = (("ddim", 50), ("dpmpp", 25), ("ddim", 20))
NUMERICS = ("f32", "bf16", "int8")
DENSE = ("ddim", 200)       # spectral-distance reference (f32)
CFG_SCALE = 6.0
SEED = 11


def synthetic_dataset(app: AppConfig, class_signal: str = "offset"):
    from diffusynth_tpu.train import SyntheticNSynthDataset

    a = app.audio
    # class_signal="offset": identical constructor to
    # int8_trained_fidelity.py so the latent distribution (and instrument
    # structure) matches the r3 U-Net's training data.
    # class_signal="template": the r5 prompt-adherence distribution
    # (distinct learnable pattern per instrument, 1:1 create_key).
    return SyntheticNSynthDataset(
        n=256, shape=(a.latent_height, a.vae_scale * 16, a.channels),
        class_signal=class_signal)


def get_timbre_classifier(app: AppConfig, class_signal: str = "offset",
                          ckpt_root: str = TE_CKPT_ROOT,
                          ckpt_name: str = TE_CKPT_NAME):
    """Train (or restore) the timbre-encoder classifier on the synthetic
    latent distribution; returns (apply_fn, params)."""
    from diffusynth_tpu.nn.timbre import TimbreEncoder
    from diffusynth_tpu.train import data_iterator, train_timbre_encoder
    from diffusynth_tpu.train.checkpoints import Checkpointer
    from diffusynth_tpu.train.logging import MetricLogger

    a = app.audio
    te_cfg = TimbreEncoderConfig(
        input_dim=a.latent_height * a.channels,
        num_instrument_classes=16)       # SyntheticNSynthDataset default
    model = TimbreEncoder(te_cfg)
    ckpt = Checkpointer(ckpt_root)
    width = a.vae_scale * 16
    template = jax.jit(model.init)(
        jax.random.key(0),
        jnp.zeros((1, a.latent_height, width, a.channels)))
    if ckpt.exists(ckpt_name, "timbre_encoder"):
        params = ckpt.restore(ckpt_name, "timbre_encoder",
                              {"variables": template, "step": 0})["variables"]
        print(f"[te] restored {ckpt_root}/{ckpt_name}", flush=True)
    else:
        ds = synthetic_dataset(app, class_signal)
        # steps_per_dispatch=8: one device dispatch per 8 optimizer steps —
        # per-step tunnel round trips made K=1 training ~2 s/step here.
        cfg = TimbreTrainConfig(max_iter=TE_ITERS,
                                save_steps=max(1, TE_ITERS // 4),
                                model_name=ckpt_name,
                                steps_per_dispatch=8)
        t0 = time.time()
        params, _ = train_timbre_encoder(
            te_cfg, cfg, data_iterator(ds, cfg.batch_size, seed=3),
            checkpointer=ckpt,
            logger=MetricLogger("runs/r4_quality/te",
                                use_tensorboard=False), seed=3)
        print(f"[te] trained {TE_ITERS} iters in {time.time()-t0:.0f}s",
              flush=True)

    apply = jax.jit(lambda p, x: model.apply(p, x))
    return apply, params


def split_scores(log_probs: np.ndarray, splits: int = 4):
    """Per-split inception scores (mean/std reported by the caller)."""
    from diffusynth_tpu.metrics.inception_score import inception_score

    return [inception_score(part)
            for part in np.array_split(np.asarray(log_probs), splits)]


def mssd(audio: np.ndarray, ref: np.ndarray,
         ffts=(256, 512, 1024, 2048)) -> float:
    """Multi-scale log-spectral distance between waveform batches (B, S):
    mean over scales of the L1 distance of log1p-magnitude STFTs."""
    from scipy.signal import stft as sstft

    total = 0.0
    for n_fft in ffts:
        _, _, A = sstft(audio, nperseg=n_fft, noverlap=n_fft * 3 // 4,
                        axis=-1)
        _, _, R = sstft(ref, nperseg=n_fft, noverlap=n_fft * 3 // 4,
                        axis=-1)
        la, lr = np.log1p(np.abs(A)), np.log1p(np.abs(R))
        total += float(np.abs(la - lr).mean() / (np.abs(lr).mean() + 1e-12))
    return total / len(ffts)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--fast", action="store_true",
                   help="ddim-50 only (smoke)")
    p.add_argument("--n", type=int, default=N)
    p.add_argument("--ckpt-root", default=CKPT_ROOT,
                   help="U-Net checkpoint dir (default: the r3 run)")
    p.add_argument("--ckpt-name", default=CKPT_NAME)
    p.add_argument("--use-ema", action="store_true",
                   help="prefer the UNet_ema role")
    p.add_argument("--class-signal", default="offset",
                   choices=["offset", "template"],
                   help="synthetic distribution the checkpoint was "
                        "trained on (template = the r5 run; consistency "
                        "is then scored 16-way instead of by-group)")
    p.add_argument("--te-root", default=None,
                   help="classifier checkpoint dir (default keyed off "
                        "class_signal so the r4 offset classifier is "
                        "never reused for a template run)")
    args = p.parse_args(argv)

    from diffusynth_tpu.pipelines import DiffuSynthRuntime
    from diffusynth_tpu.text import CachedTextEncoder, HashTextEncoder
    from diffusynth_tpu.train.checkpoints import Checkpointer
    from diffusynth_tpu.train.run import _condition_lookup

    app = AppConfig()
    a = app.audio
    width = a.vae_scale * 16       # the U-Net's training width (64)

    # --- classifier + trained U-Net ---------------------------------------
    te_root = args.te_root or (
        TE_CKPT_ROOT if args.class_signal == "offset"
        else "runs/r5_adherence/models")
    te_name = TE_CKPT_NAME if args.class_signal == "offset" else "r5te"
    te_apply, te_params = get_timbre_classifier(
        app, args.class_signal, te_root, te_name)

    base_rt = DiffuSynthRuntime(
        app, text_encoder=CachedTextEncoder(HashTextEncoder(512)), seed=0)
    ck = Checkpointer(args.ckpt_root)
    role = "UNet_ema" if args.use_ema and ck.exists(args.ckpt_name,
                                                    "UNet_ema") else "UNet"
    unet_params = ck.restore(
        args.ckpt_name, role,
        {"variables": base_rt.unet_variables, "step": 0})["variables"]
    print(f"restored {args.ckpt_root}/{args.ckpt_name}_{role}", flush=True)

    # --- conditions: one instrument per sample, spanning the training set -
    ds = synthetic_dataset(app, args.class_signal)
    _, attrs = ds.get_batch(np.arange(args.n) % len(ds))
    lookup = _condition_lookup(app.unet.label_emb_dim)
    cond = jnp.asarray(lookup(attrs), jnp.float32)          # (N, D)
    uncond = np.zeros(app.unet.label_emb_dim, np.float32)   # training CFG-drop
    inst_group = np.asarray([at["instrument"] % 5 for at in attrs])
    cond_inst = np.asarray([at["instrument"] for at in attrs])

    def run_config(numerics: str, sampler: str, steps: int):
        capp = app
        if numerics == "f32":
            capp = dataclasses.replace(app, compute_dtype="float32")
        elif numerics == "int8":
            capp = dataclasses.replace(
                app, unet=dataclasses.replace(app.unet, quantize="int8"))
        rt = DiffuSynthRuntime(
            capp, unet_variables=unet_params,
            vqgan_variables=base_rt.vqgan_variables,
            text_encoder=CachedTextEncoder(HashTextEncoder(512)), seed=0)
        from diffusynth_tpu.diffusion.schedule import respaced_timesteps

        s = rt.make_sampler()
        s.respace(list(respaced_timesteps(app.diffusion.timesteps, steps)))
        s.activate_classifier_free_guidance(CFG_SCALE, uncond)
        t0 = time.time()
        latents, _ = s.sample(rt.unet_variables,
                              (args.n, a.latent_height, width, a.channels),
                              jax.random.key(SEED), condition=cond,
                              sampler=sampler)
        _, _, audio = rt.decode_latents_full(latents, quantize=True,
                                             audio_format="f32")
        wall = time.time() - t0
        return (np.asarray(latents, np.float32),
                np.asarray(audio, np.float32), wall)

    # --- dense reference (spectral-distance anchor) ------------------------
    print(f"[dense] f32 {DENSE[0]}-{DENSE[1]} ...", flush=True)
    dense_lat, dense_audio, wall = run_config("f32", *DENSE)
    _, dense_logp, *_ = te_apply(te_params, jnp.asarray(dense_lat))
    dense_is = split_scores(np.asarray(dense_logp))
    print(f"[dense] wall {wall:.1f}s  IS {np.mean(dense_is):.3f} "
          f"+/- {np.std(dense_is):.3f}", flush=True)

    samplers = SAMPLERS[:1] if args.fast else SAMPLERS
    rows = []
    for numerics in NUMERICS:
        for sampler, steps in samplers:
            lat, audio, wall = run_config(numerics, sampler, steps)
            _, logp, *_ = te_apply(te_params, jnp.asarray(lat))
            logp = np.asarray(logp)
            scores = split_scores(logp)
            # Conditional consistency: posterior mass on the conditioned
            # class. offset signal: grouped by its learnable instrument%5
            # structure (chance ~0.2); template signal: the full 16-way
            # instrument (chance 0.0625).
            probs = np.exp(logp)                        # (N, 16)
            if args.class_signal == "template":
                consistency = float(
                    probs[np.arange(len(probs)), cond_inst].mean())
            else:
                group_probs = np.zeros((len(probs), 5))
                for k in range(16):
                    group_probs[:, k % 5] += probs[:, k]
                consistency = float(
                    group_probs[np.arange(len(probs)), inst_group].mean())
            row = {
                "numerics": numerics, "sampler": f"{sampler}-{steps}",
                "is_mean": round(float(np.mean(scores)), 3),
                "is_std": round(float(np.std(scores)), 3),
                "consistency": round(consistency, 3),
                "mssd_vs_dense": round(mssd(audio, dense_audio), 4),
                "wall_s": round(wall, 1),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    print("\n| numerics | sampler | IS (4 splits) | cond.consistency "
          "| MSSD vs dense | wall s |")
    print("|---|---|---|---|---|---|")
    print(f"| f32 (anchor) | {DENSE[0]}-{DENSE[1]} | "
          f"{np.mean(dense_is):.3f} +/- {np.std(dense_is):.3f} | — | 0 "
          f"(def) | — |")
    for r in rows:
        print(f"| {r['numerics']} | {r['sampler']} | {r['is_mean']:.3f} "
              f"+/- {r['is_std']:.3f} | {r['consistency']:.3f} | "
              f"{r['mssd_vs_dense']:.4f} | {r['wall_s']} |")


if __name__ == "__main__":
    main()
