"""Training CLI: the runnable equivalent of the reference's Colab notebooks.

  python -m diffusynth_tpu.train.run --model vqgan --synthetic --max-iter 100
  python -m diffusynth_tpu.train.run --model diffusion --data data.hdf5 \
      --latents --max-iter 40000

Models: vqgan | diffusion | timbre | contrastive | gan.
Data: --data <hdf5> (NSynth layout, see train/data.py) or --synthetic.
Conditions: diffusion/gan/contrastive need text features per attribute key.
--captions <json> supplies the reference's encodes2embeddings mapping
(create_key -> list of CLAP caption embeddings; a random variant is picked
per sample each step, reference: model/diffusion.py:471-476); without it a
deterministic hash embedding per create_key stands in.
"""

from __future__ import annotations

import argparse

import numpy as np

from diffusynth_tpu.configs import (
    AppConfig,
    ContrastiveTrainConfig,
    DiffusionTrainConfig,
    GANTrainConfig,
    TimbreTrainConfig,
    VQGANTrainConfig,
)
from diffusynth_tpu.dsp.utils import create_key
from diffusynth_tpu.text import HashTextEncoder
from diffusynth_tpu.train import (
    Checkpointer,
    NSynthDataset,
    SyntheticNSynthDataset,
    data_iterator,
    train_diffusion_model,
    train_gan,
    train_multimodal,
    train_timbre_encoder,
    train_vqgan,
)


def _condition_lookup(dim: int = 512):
    """Deterministic embedding per label key (caption-embedding stand-in)."""
    enc = HashTextEncoder(dim)

    def lookup(attributes):
        return enc.encode([create_key(a) for a in attributes])

    return lookup


def _mapping_lookup(path: str, dim: int, seed: int):
    """Condition lookup backed by a create_key -> [embedding, ...] JSON
    mapping (the reference's encodes2embeddings_mapping side-data;
    reference: model/diffusion.py:471-476 picks a random caption variant
    per sample each step). Keys absent from the mapping fall back to the
    deterministic hash embedding."""
    from diffusynth_tpu.train.data import load_caption_mapping

    mapping = load_caption_mapping(path)
    rng = np.random.default_rng(seed)
    fallback = HashTextEncoder(dim)
    missing = set()

    def lookup(attributes):
        out = np.empty((len(attributes), dim), dtype=np.float32)
        for i, a in enumerate(attributes):
            key = create_key(a)
            variants = mapping.get(key)
            if not variants:
                if key not in missing:
                    missing.add(key)
                    print(f"[captions] no embedding for key {key!r}; "
                          f"using the hash stand-in")
                out[i] = fallback.encode([key])[0]
                continue
            if np.isscalar(variants[0]) or isinstance(variants[0], float):
                v = np.asarray(variants, dtype=np.float32)  # single embedding
            else:
                v = np.asarray(variants[int(rng.integers(len(variants)))],
                               dtype=np.float32)
            assert v.shape == (dim,), (v.shape, dim)
            out[i] = v
        return out

    return lookup


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", required=True,
                        choices=["vqgan", "diffusion", "timbre",
                                 "contrastive", "gan"])
    parser.add_argument("--data", default=None, help="NSynth-layout HDF5")
    parser.add_argument("--latents", action="store_true",
                        help="HDF5 stores latents (for diffusion/timbre)")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--max-iter", type=int, default=None)
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--save-steps", type=int, default=None,
                        help="checkpoint cadence (steps) for all models")
    parser.add_argument("--models-dir", default="models_jax")
    parser.add_argument("--name", default=None)
    parser.add_argument("--mesh", action="store_true",
                        help="data-parallel over all devices")
    parser.add_argument("--captions", default=None,
                        help="create_key -> [CLAP embedding, ...] JSON "
                             "mapping (the reference's encodes2embeddings "
                             "side-data); conditions diffusion/gan/"
                             "contrastive training on real caption "
                             "embeddings instead of the hash stand-in")
    parser.add_argument("--ema-decay", type=float, default=None,
                        help="weight-EMA decay for diffusion training "
                             "(e.g. 0.9995; default off = reference "
                             "behavior)")
    parser.add_argument("--compute-dtype", default=None,
                        choices=["bfloat16", "float32"],
                        help="forward/backward compute dtype for "
                             "vqgan/diffusion/gan (params stay float32; "
                             "default bfloat16, the TPU-native choice; "
                             "float32 matches the reference numerics)")
    parser.add_argument("--steps-per-dispatch", type=int, default=None,
                        help="optimizer steps per jitted dispatch ("
                             "lax.scan over K stacked batches — "
                             "amortizes per-call overhead on dispatch-bound "
                             "environments, docs/TRAINING.md)")
    parser.add_argument("--lora-rank", type=int, default=None,
                        help="diffusion only: train a rank-r LoRA adapter "
                             "on frozen base weights instead of full "
                             "fine-tuning (train/lora.py; checkpointed as "
                             "role UNet_lora)")
    parser.add_argument("--lora-alpha", type=float, default=16.0)
    parser.add_argument("--lora-targets", default=None,
                        help="comma-separated path substrings to adapt "
                             "(e.g. 'to_qkv,to_out'); default = every Dense/Conv "
                             "kernel")
    parser.add_argument("--lora-base", default=None,
                        help="checkpoint NAME whose UNet role supplies "
                             "the frozen base weights (default: --name; "
                             "random init with a warning if absent)")
    parser.add_argument("--runs-dir", default="runs",
                        help="root for metrics.jsonl / TensorBoard output "
                             "(default ./runs)")
    parser.add_argument("--tiny", action="store_true",
                        help="miniature model geometry (configs."
                             "tiny_app_config) for smoke round-trips")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--resume", action="store_true",
                        help="diffusion only: continue from the "
                             "{name}_UNet + {name}_UNet_opt checkpoints "
                             "in --models-dir; the data and PRNG streams "
                             "replay deterministically, so a resumed run "
                             "continues the killed one bit-identically "
                             "(diffusion_train.restore_diffusion_state)")
    parser.add_argument("--class-signal", default="offset",
                        choices=["offset", "template"],
                        help="synthetic-data condition signal: 'template' "
                             "gives each instrument a distinct learnable "
                             "pattern + a 1:1 create_key (the r5 "
                             "prompt-adherence distribution, train/data.py)")
    args = parser.parse_args(argv)

    import os as _os

    from diffusynth_tpu.train.logging import MetricLogger

    def mk_logger(name, role):
        return MetricLogger(_os.path.join(args.runs_dir, f"{name}_{role}"))

    if args.tiny:
        from diffusynth_tpu.configs import tiny_app_config

        app = tiny_app_config()
    else:
        app = AppConfig()
    a = app.audio
    if args.synthetic or args.data is None:
        latent_shape = (a.latent_height, a.vae_scale * 16, a.channels)
        stft_shape = (a.freq_resolution, a.time_resolution, 3)
        shape = stft_shape if args.model == "vqgan" else latent_shape
        dataset = SyntheticNSynthDataset(n=256, shape=shape,
                                         class_signal=args.class_signal)
    else:
        dataset = NSynthDataset(
            args.data, task="latent" if args.latents else "STFT")

    mesh = None
    if args.mesh:
        from diffusynth_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()

    ckpt = Checkpointer(args.models_dir)
    if args.captions:
        lookup = _mapping_lookup(args.captions, app.unet.label_emb_dim,
                                 args.seed)
    else:
        lookup = _condition_lookup(app.unet.label_emb_dim)

    if args.model == "vqgan":
        cfg = VQGANTrainConfig(model_name=args.name or "vqgan")
        if args.max_iter is not None:
            cfg = cfg.replace(max_iter=args.max_iter)
        if args.batch_size is not None:
            cfg = cfg.replace(batch_size=args.batch_size)
        if args.save_steps is not None:
            cfg = cfg.replace(save_steps=args.save_steps)
        if args.compute_dtype is not None:
            cfg = cfg.replace(compute_dtype=args.compute_dtype)
        if args.steps_per_dispatch is not None:
            cfg = cfg.replace(steps_per_dispatch=args.steps_per_dispatch)
        it = data_iterator(dataset, cfg.batch_size, seed=args.seed)
        train_vqgan(app.vqgan, cfg, it, checkpointer=ckpt, mesh=mesh,
                    logger=mk_logger(cfg.model_name, "VQVAE"),
                    seed=args.seed)
    elif args.model == "diffusion":
        cfg = DiffusionTrainConfig(model_name=args.name or "unet")
        if args.max_iter is not None:
            cfg = cfg.replace(max_iter=args.max_iter)
        if args.batch_size is not None:
            cfg = cfg.replace(batch_size=args.batch_size)
        if args.save_steps is not None:
            cfg = cfg.replace(save_steps=args.save_steps)
        if args.ema_decay is not None:
            cfg = cfg.replace(ema_decay=args.ema_decay)
        if args.compute_dtype is not None:
            cfg = cfg.replace(compute_dtype=args.compute_dtype)
        if args.steps_per_dispatch is not None:
            cfg = cfg.replace(steps_per_dispatch=args.steps_per_dispatch)
        resume_state = None
        if args.resume and not args.lora_rank:
            from diffusynth_tpu.train.diffusion_train import (
                restore_diffusion_state,
            )

            resume_state = restore_diffusion_state(
                app.unet, cfg, ckpt,
                (a.latent_height, a.vae_scale * 16, a.channels))
            if resume_state is None:
                print(f"# --resume: no {cfg.model_name}_UNet(+_opt) "
                      f"checkpoint in {args.models_dir}; starting fresh")
            else:
                print(f"# resuming {cfg.model_name} from step "
                      f"{resume_state[2]}")
        skip = resume_state[2] if resume_state else 0
        it = data_iterator(dataset, cfg.batch_size, seed=args.seed,
                           skip=skip)
        uncond = np.zeros(app.unet.label_emb_dim, np.float32)
        if args.lora_rank:
            import jax
            import jax.numpy as jnp

            from diffusynth_tpu.nn.unet import ConditionedUnet
            from diffusynth_tpu.train import train_diffusion_lora

            unet_mod = ConditionedUnet(app.unet)
            data0, attrs0 = next(it)
            template = jax.jit(unet_mod.init)(
                jax.random.key(args.seed), jnp.asarray(data0),
                jnp.zeros(data0.shape[0], jnp.int32),
                jnp.asarray(lookup(attrs0)))
            base_name = args.lora_base or cfg.model_name
            if ckpt.exists(base_name, "UNet"):
                base = ckpt.restore(base_name, "UNet",
                                    {"variables": template, "step": 0}
                                    )["variables"]
            else:
                print(f"# no {base_name}_UNet checkpoint in "
                      f"{args.models_dir}; LoRA over RANDOM base weights "
                      f"(smoke-test mode)")
                base = template
            targets = (args.lora_targets.split(",")
                       if args.lora_targets else None)
            train_diffusion_lora(
                app.unet, cfg, it, lookup, uncond, base,
                rank=args.lora_rank, alpha=args.lora_alpha,
                targets=targets, checkpointer=ckpt, mesh=mesh,
                logger=mk_logger(cfg.model_name, "UNet_lora"),
                seed=args.seed)
        else:
            kw = {}
            if resume_state is not None:
                kw = dict(init_variables=resume_state[0],
                          init_opt_state=resume_state[1],
                          start_step=resume_state[2])
            train_diffusion_model(app.unet, cfg, it, lookup, uncond,
                                  checkpointer=ckpt, mesh=mesh,
                                  logger=mk_logger(cfg.model_name, "UNet"),
                                  seed=args.seed, **kw)
    elif args.model == "timbre":
        cfg = TimbreTrainConfig(model_name=args.name or "timbre_encoder")
        if args.max_iter is not None:
            cfg = cfg.replace(max_iter=args.max_iter)
        if args.batch_size is not None:
            cfg = cfg.replace(batch_size=args.batch_size)
        if args.save_steps is not None:
            cfg = cfg.replace(save_steps=args.save_steps)
        if args.steps_per_dispatch is not None:
            cfg = cfg.replace(steps_per_dispatch=args.steps_per_dispatch)
        it = data_iterator(dataset, cfg.batch_size, seed=args.seed)
        train_timbre_encoder(app.timbre, cfg, it, checkpointer=ckpt,
                             mesh=mesh,
                             logger=mk_logger(cfg.model_name,
                                              "timbre_encoder"),
                             seed=args.seed)
    elif args.model == "contrastive":
        cfg = ContrastiveTrainConfig(model_name=args.name or "mmm")
        if args.max_iter is not None:
            cfg = cfg.replace(max_iter=args.max_iter)
        if args.batch_size is not None:
            cfg = cfg.replace(batch_size=args.batch_size)
        if args.save_steps is not None:
            cfg = cfg.replace(save_steps=args.save_steps)
        if args.steps_per_dispatch is not None:
            cfg = cfg.replace(steps_per_dispatch=args.steps_per_dispatch)
        it = data_iterator(dataset, cfg.batch_size, seed=args.seed)
        tf_lookup = (_mapping_lookup(args.captions,
                                     app.multimodal.text_feature_dim,
                                     args.seed)
                     if args.captions else
                     _condition_lookup(app.multimodal.text_feature_dim))
        train_multimodal(app.multimodal, app.timbre, cfg, it, tf_lookup,
                         checkpointer=ckpt, mesh=mesh,
                         logger=mk_logger(cfg.model_name, "MMM"),
                         seed=args.seed)
    elif args.model == "gan":
        cfg = GANTrainConfig(model_name=args.name or "gan")
        if args.max_iter is not None:
            cfg = cfg.replace(max_iter=args.max_iter)
        if args.batch_size is not None:
            cfg = cfg.replace(batch_size=args.batch_size)
        if args.save_steps is not None:
            cfg = cfg.replace(save_steps=args.save_steps)
        if args.compute_dtype is not None:
            cfg = cfg.replace(compute_dtype=args.compute_dtype)
        if args.steps_per_dispatch is not None:
            cfg = cfg.replace(steps_per_dispatch=args.steps_per_dispatch)
        it = data_iterator(dataset, cfg.batch_size, seed=args.seed)
        train_gan(app.unet, cfg, it, lookup, checkpointer=ckpt, mesh=mesh,
                  logger=mk_logger(cfg.model_name, "GAN"),
                  seed=args.seed)
    print("training complete")


if __name__ == "__main__":
    main()
