"""Generate a batch that morphs between two timbres by interpolating the
initial noise (reference: DiffSynthSampler.interpolate, :538-560).

  python examples/interpolate.py --tiny --cpu
  python examples/interpolate.py --prompt "a warm organ" --batch 8

Each batch item starts from a noise tensor linearly interpolated between
two endpoints, so adjacent outputs vary smoothly — useful for exploring the
timbre space around a prompt.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from _common import base_parser, make_runtime, save_outputs


def main():
    p = base_parser(__doc__)
    p.add_argument("--prompt", default="a bright synthetic lead")
    p.add_argument("--negative-prompt", default="noise")
    p.add_argument("--batch", type=int, default=6,
                   help="interpolation points incl. the two endpoints")
    p.add_argument("--duration", type=float, default=3.0)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--cfg", type=float, default=6.0)
    p.add_argument("--sampler", default="ddim",
                   choices=("ddim", "ddpm", "dpmpp"))
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    runtime = make_runtime(args)
    from diffusynth_tpu.diffusion.schedule import respaced_timesteps

    import numpy as np

    a = runtime.config.audio
    duration = 1.0 if args.tiny else args.duration
    width = a.width_from_duration(duration)
    shape = (args.batch, a.latent_height, width, a.channels)

    s = runtime.make_sampler()
    s.respace(list(respaced_timesteps(
        runtime.config.diffusion.timesteps, args.steps)))
    uncond = runtime.encode_text([args.negative_prompt])[0]
    if args.cfg != 1.0:
        s.activate_classifier_free_guidance(args.cfg, uncond)
    cond = jnp.broadcast_to(runtime.encode_text([args.prompt]),
                            (args.batch, runtime.text_encoder.feature_dim))

    latents, _ = s.interpolate(
        runtime.unet_variables, shape, jax.random.key(args.seed),
        condition=cond, sampler=args.sampler)

    quantized, spectrograms, audio = runtime.decode_latents_full(latents)

    from dataclasses import dataclass

    @dataclass
    class _Result:
        audio: np.ndarray
        spectrograms: jnp.ndarray
        sample_rate: int

    print(f"{args.batch} interpolation points, latents {latents.shape}")
    save_outputs(args.out, "interpolate",
                 _Result(np.asarray(audio), spectrograms, a.sample_rate))


if __name__ == "__main__":
    main()
