"""CLI: convert reference PyTorch checkpoints to orbax.

Usage:
  python -m diffusynth_tpu.compat.convert_cli \
      --role vqgan --pth models/24_1_2024-52_4x_L_D_imageVQVAE.pth \
      --out models_jax --name vqgan

Roles: vqgan | unet | timbre | mmm. The converted variables load via
train.checkpoints.Checkpointer or DiffuSynthRuntime.from_pretrained.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp


def convert(role: str, pth_path: str, out_dir: str, name: str,
            config=None):
    from diffusynth_tpu.compat import (
        convert_multimodal_state,
        convert_timbre_state,
        convert_unet_state,
        convert_vqgan_state,
        load_reference_checkpoint,
    )
    from diffusynth_tpu.configs import AppConfig
    from diffusynth_tpu.train.checkpoints import Checkpointer

    cfg = config or AppConfig()
    state_dict = load_reference_checkpoint(pth_path)
    ckpt = Checkpointer(out_dir)

    if role == "vqgan":
        from diffusynth_tpu.nn.vqgan import VQGAN

        model = VQGAN(cfg.vqgan)
        a = cfg.audio
        variables = model.init(
            jax.random.key(0),
            jnp.zeros((1, a.freq_resolution, a.time_resolution, 3)),
        )
        variables = convert_vqgan_state(state_dict, variables)
        ckpt.save(name, "imageVQVAE", {"variables": variables, "step": 0})
    elif role == "unet":
        from diffusynth_tpu.nn.unet import ConditionedUnet

        model = ConditionedUnet(cfg.unet)
        a = cfg.audio
        variables = model.init(
            jax.random.key(0),
            jnp.zeros((1, a.latent_height, 8, a.channels)),
            jnp.zeros(1, jnp.int32),
            jnp.zeros((1, cfg.unet.label_emb_dim)),
        )
        variables = convert_unet_state(state_dict, variables)
        ckpt.save(name, "UNet", {"variables": variables, "step": 0})
    elif role == "timbre":
        from diffusynth_tpu.nn.timbre import TimbreEncoder

        model = TimbreEncoder(cfg.timbre)
        a = cfg.audio
        variables = model.init(
            jax.random.key(0),
            jnp.zeros((1, a.latent_height, 8, a.channels)))
        variables = convert_timbre_state(state_dict, variables)
        ckpt.save(name, "timbre_encoder", {"variables": variables, "step": 0})
    elif role == "mmm":
        from diffusynth_tpu.nn.multimodal import MultiModalModel

        model = MultiModalModel(cfg.multimodal, cfg.timbre)
        a = cfg.audio
        variables = model.init(
            jax.random.key(0),
            jnp.zeros((1, a.latent_height, 8, a.channels)),
            jnp.zeros((1, cfg.multimodal.text_feature_dim)),
        )
        variables = convert_multimodal_state(state_dict, variables)
        ckpt.save(name, "MMM", {"variables": variables, "step": 0})
    else:
        raise ValueError(role)
    print(f"converted {pth_path} -> {out_dir}/{name}_{role}")


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--role", required=True,
                        choices=["vqgan", "unet", "timbre", "mmm"])
    parser.add_argument("--pth", required=True)
    parser.add_argument("--out", default="models_jax")
    parser.add_argument("--name", required=True)
    args = parser.parse_args(argv)
    convert(args.role, args.pth, args.out, args.name)


if __name__ == "__main__":
    main()
