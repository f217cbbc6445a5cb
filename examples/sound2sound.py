"""Text-guided style transfer of an input sound (reference: sound2sound tab).

  python examples/sound2sound.py --tiny --cpu
  python examples/sound2sound.py --wav my_note.wav --prompt "warm organ"

Without --wav a synthetic harmonic tone stands in for the upload, so the
example is self-contained.
"""

from __future__ import annotations

import numpy as np

from _common import base_parser, make_runtime, save_outputs


def synthetic_upload(sample_rate: int, seconds: float) -> np.ndarray:
    """A decaying harmonic tone standing in for a user recording."""
    t = np.arange(int(sample_rate * seconds)) / sample_rate
    wave = sum(a * np.sin(2 * np.pi * 220.0 * k * t)
               for k, a in enumerate((1.0, 0.5, 0.33, 0.25), start=1))
    return (wave * np.exp(-t / max(seconds / 2, 1e-3))).astype(np.float32)


def main():
    p = base_parser(__doc__)
    p.add_argument("--wav", default=None, help="input WAV (default: synthetic)")
    p.add_argument("--prompt", default="a warm organ")
    p.add_argument("--negative-prompt", default="noise")
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--duration", type=float, default=3.0)
    p.add_argument("--strength", type=float, default=0.7,
                   help="noising strength: 0 = copy input, 1 = ignore it")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--cfg", type=float, default=6.0)
    p.add_argument("--sampler", default="ddim",
                   choices=("ddim", "ddpm", "dpmpp"))
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    runtime = make_runtime(args)
    from diffusynth_tpu.native import read_wav
    from diffusynth_tpu.pipelines import Sound2SoundPipeline

    pipe = Sound2SoundPipeline(runtime)
    duration = 1.0 if args.tiny else args.duration
    if args.wav:
        sr, audio = read_wav(args.wav)
    else:
        sr = runtime.config.audio.sample_rate
        audio = synthetic_upload(sr, duration)

    _, _, origin_latent = pipe.encode_origin_audio(audio, sr, duration)
    result = pipe(origin_latent, args.prompt, args.negative_prompt,
                  batchsize=args.batch, noising_strength=args.strength,
                  steps=args.steps, cfg=args.cfg, sampler=args.sampler,
                  seed=args.seed)
    print(f"origin latent {origin_latent.shape} -> audio {result.audio.shape}")
    save_outputs(args.out, "sound2sound", result)


if __name__ == "__main__":
    main()
