"""Generate timbres from a text prompt (reference: webUI text2sound tab).

  python examples/text2sound.py --tiny --cpu            # API smoke, seconds
  python examples/text2sound.py                         # production config
  python examples/text2sound.py --checkpoint /path/ckpt # trained weights

With random weights the audio is structured noise; the point of --tiny is
the API shape. `--sampler dpmpp --steps 20` gives 50-step-DDIM quality at
20 steps (benchmarks/sampler_convergence.py).
"""

from __future__ import annotations

from _common import base_parser, make_runtime, save_outputs


def main():
    p = base_parser(__doc__)
    p.add_argument("--prompt", default="a bright synthetic lead")
    p.add_argument("--negative-prompt", default="noise")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--duration", type=float, default=3.0)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--cfg", type=float, default=6.0)
    p.add_argument("--sampler", default="ddim",
                   choices=("ddim", "ddpm", "dpmpp"))
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    runtime = make_runtime(args)
    from diffusynth_tpu.pipelines import Text2SoundPipeline

    pipe = Text2SoundPipeline(runtime)
    duration = 1.0 if args.tiny else args.duration
    result = pipe(args.prompt, args.negative_prompt, batchsize=args.batch,
                  duration_sec=duration, steps=args.steps, cfg=args.cfg,
                  sampler=args.sampler, seed=args.seed)
    print(f"latents {result.latents.shape}, audio {result.audio.shape} "
          f"@ {result.sample_rate} Hz")
    save_outputs(args.out, "text2sound", result)


if __name__ == "__main__":
    main()
