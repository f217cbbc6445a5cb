"""LoRA fine-tune of the diffusion U-Net, end to end (beyond-reference).

  python examples/finetune_lora.py --tiny --cpu     # full cycle, seconds
  python examples/finetune_lora.py                  # production config

Cycle: save base checkpoints -> train a rank-r adapter on synthetic
latents (base weights frozen; train/lora.py) -> checkpoint ONLY the
adapter (role UNet_lora) -> reload with
DiffuSynthRuntime.from_pretrained(lora_name=...), which bakes the adapter
into the U-Net at load time -> generate. With random weights the audio is
noise; the point is the adapter workflow. The reference has no
parameter-efficient fine-tuning path (full notebook re-runs only).
"""

from __future__ import annotations

import numpy as np

from _common import base_parser, make_runtime, save_outputs


def main():
    p = base_parser(__doc__)
    p.add_argument("--rank", type=int, default=4)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--steps", type=int, default=3, help="sampling steps")
    p.add_argument("--prompt", default="a mellow fine-tuned pad")
    args = p.parse_args()

    runtime = make_runtime(args)

    import jax
    import jax.numpy as jnp

    from diffusynth_tpu.train import Checkpointer
    from diffusynth_tpu.train.lora import (
        init_lora, lora_num_params, make_lora_train_step)

    models_dir = f"{args.out}/models"
    ckpt = Checkpointer(models_dir)
    ckpt.save("vqgan", "imageVQVAE",
              {"variables": runtime.vqgan_variables, "step": 0})
    ckpt.save("unet", "UNet", {"variables": runtime.unet_variables, "step": 0})

    # Adapter-only training on synthetic latents (stands in for a real
    # fine-tune corpus; see docs/TRAINING.md for the HDF5 CLI path).
    d = runtime.config.diffusion
    base = runtime.unet_variables
    n_base = sum(int(np.prod(x.shape))
                 for x in jax.tree_util.tree_leaves(base))
    lora = init_lora(base, jax.random.key(1), rank=args.rank)
    print(f"adapter: {len(lora)} sites, {lora_num_params(lora)} params "
          f"({100 * lora_num_params(lora) / n_base:.2f}% of the U-Net)")
    init_fn, step_fn = make_lora_train_step(
        runtime.unet, timesteps=d.timesteps, lr=1e-3)
    opt_state = init_fn(lora)
    rng = np.random.default_rng(0)
    latents = jnp.asarray(
        rng.standard_normal((2, d.height, d.train_width, d.channels)),
        jnp.float32)
    cond = jnp.asarray(rng.standard_normal(
        (2, runtime.config.unet.label_emb_dim)), jnp.float32)
    uncond = jnp.zeros(runtime.config.unet.label_emb_dim)
    first = last = None
    for i in range(args.iters):
        lora, opt_state, loss = step_fn(
            base, lora, opt_state, jax.random.key(i), latents, cond, uncond)
        first = float(loss) if first is None else first
        last = float(loss)
    print(f"adapter loss {first:.4f} -> {last:.4f} over {args.iters} steps")

    ckpt.save("unet_ft", "UNet_lora", {"variables": lora, "step": args.iters})
    ckpt.save_hyperparameters("unet_ft", "UNet_lora",
                              {"rank": args.rank, "alpha": 16.0,
                               "targets": None})

    # Reload: the adapter is baked into the U-Net weights at load time.
    from diffusynth_tpu.pipelines import DiffuSynthRuntime, Text2SoundPipeline

    rt2 = DiffuSynthRuntime.from_pretrained(
        models_dir, config=runtime.config, text_encoder=runtime.text_encoder,
        seed=0, lora_name="unet_ft")
    delta = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(
        jax.tree_util.tree_leaves(rt2.unet_variables),
        jax.tree_util.tree_leaves(base)))
    print(f"baked-in weight delta max {delta:.2e}")

    result = Text2SoundPipeline(rt2)(
        args.prompt, "", batchsize=1, duration_sec=1.0,
        steps=args.steps, cfg=3.0, seed=0)
    print(f"latents {result.latents.shape}, audio {result.audio.shape} "
          f"@ {result.sample_rate} Hz")
    save_outputs(args.out, "finetune_lora", result)


if __name__ == "__main__":
    main()
