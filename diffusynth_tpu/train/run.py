"""Training CLI: the runnable equivalent of the reference's Colab notebooks.

  python -m diffusynth_tpu.train.run --model vqgan --synthetic --max-iter 100
  python -m diffusynth_tpu.train.run --model diffusion --data data.hdf5 \
      --latents --max-iter 40000

Models: vqgan | diffusion | timbre | contrastive | gan.
Data: --data <hdf5> (NSynth layout, see train/data.py) or --synthetic.
Conditions: diffusion/gan/contrastive need text features per attribute key;
with --synthetic (or no caption mapping) a deterministic hash embedding per
create_key stands in (the reference uses GPT-caption CLAP embeddings keyed
the same way, SURVEY.md section 1).
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
    parser.add_argument("--models-dir", default="models_jax")
    parser.add_argument("--name", default=None)
    parser.add_argument("--mesh", action="store_true",
                        help="data-parallel over all devices")
    parser.add_argument("--ema-decay", type=float, default=None,
                        help="weight-EMA decay for diffusion training "
                             "(e.g. 0.9995; default off = reference "
                             "behavior)")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    app = AppConfig()
    a = app.audio
    if args.synthetic or args.data is None:
        latent_shape = (a.latent_height, a.vae_scale * 16, a.channels)
        stft_shape = (a.freq_resolution, a.time_resolution, 3)
        shape = stft_shape if args.model == "vqgan" else latent_shape
        dataset = SyntheticNSynthDataset(n=256, shape=shape)
    else:
        dataset = NSynthDataset(
            args.data, task="latent" if args.latents else "STFT")

    mesh = None
    if args.mesh:
        from diffusynth_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()

    ckpt = Checkpointer(args.models_dir)
    lookup = _condition_lookup(app.unet.label_emb_dim)

    if args.model == "vqgan":
        cfg = VQGANTrainConfig(model_name=args.name or "vqgan")
        if args.max_iter is not None:
            cfg = cfg.replace(max_iter=args.max_iter)
        if args.batch_size is not None:
            cfg = cfg.replace(batch_size=args.batch_size)
        it = data_iterator(dataset, cfg.batch_size, seed=args.seed)
        train_vqgan(app.vqgan, cfg, it, checkpointer=ckpt, mesh=mesh,
                    seed=args.seed)
    elif args.model == "diffusion":
        cfg = DiffusionTrainConfig(model_name=args.name or "unet")
        if args.max_iter is not None:
            cfg = cfg.replace(max_iter=args.max_iter)
        if args.batch_size is not None:
            cfg = cfg.replace(batch_size=args.batch_size)
        if args.ema_decay is not None:
            cfg = cfg.replace(ema_decay=args.ema_decay)
        it = data_iterator(dataset, cfg.batch_size, seed=args.seed)
        uncond = np.zeros(app.unet.label_emb_dim, np.float32)
        train_diffusion_model(app.unet, cfg, it, lookup, uncond,
                              checkpointer=ckpt, mesh=mesh, seed=args.seed)
    elif args.model == "timbre":
        cfg = TimbreTrainConfig(model_name=args.name or "timbre_encoder")
        if args.max_iter is not None:
            cfg = cfg.replace(max_iter=args.max_iter)
        if args.batch_size is not None:
            cfg = cfg.replace(batch_size=args.batch_size)
        it = data_iterator(dataset, cfg.batch_size, seed=args.seed)
        train_timbre_encoder(app.timbre, cfg, it, checkpointer=ckpt,
                             mesh=mesh, seed=args.seed)
    elif args.model == "contrastive":
        cfg = ContrastiveTrainConfig(model_name=args.name or "mmm")
        if args.max_iter is not None:
            cfg = cfg.replace(max_iter=args.max_iter)
        if args.batch_size is not None:
            cfg = cfg.replace(batch_size=args.batch_size)
        it = data_iterator(dataset, cfg.batch_size, seed=args.seed)
        tf_lookup = _condition_lookup(app.multimodal.text_feature_dim)
        train_multimodal(app.multimodal, app.timbre, cfg, it, tf_lookup,
                         checkpointer=ckpt, mesh=mesh, seed=args.seed)
    elif args.model == "gan":
        cfg = GANTrainConfig(model_name=args.name or "gan")
        if args.max_iter is not None:
            cfg = cfg.replace(max_iter=args.max_iter)
        if args.batch_size is not None:
            cfg = cfg.replace(batch_size=args.batch_size)
        it = data_iterator(dataset, cfg.batch_size, seed=args.seed)
        train_gan(app.unet, cfg, it, lookup, checkpointer=ckpt, mesh=mesh,
                  seed=args.seed)
    print("training complete")


if __name__ == "__main__":
    main()
