"""Regenerate a time/frequency region of a sound under text guidance
(reference: inpaint_with_text tab).

  python examples/inpaint.py --tiny --cpu
  python examples/inpaint.py --wav my_note.wav --mask-begin 1.0 --mask-end 2.0

The mask marks the region to REGENERATE (inpaint_area="masked"); everything
else is frozen to the input. Masks can also come from drawn pixel layers —
see pipelines.inpaint.build_latent_mask.
"""

from __future__ import annotations

from _common import base_parser, make_runtime, save_outputs
from sound2sound import synthetic_upload


def main():
    p = base_parser(__doc__)
    p.add_argument("--wav", default=None, help="input WAV (default: synthetic)")
    p.add_argument("--prompt", default="a plucked string")
    p.add_argument("--negative-prompt", default="noise")
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--duration", type=float, default=3.0)
    p.add_argument("--mask-begin", type=float, default=1.0,
                   help="regenerate from this time (s)")
    p.add_argument("--mask-end", type=float, default=2.0,
                   help="...to this time (s)")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--cfg", type=float, default=6.0)
    p.add_argument("--sampler", default="ddim",
                   choices=("ddim", "ddpm", "dpmpp"))
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    runtime = make_runtime(args)
    from diffusynth_tpu.native import read_wav
    from diffusynth_tpu.pipelines import InpaintPipeline, Sound2SoundPipeline
    from diffusynth_tpu.pipelines.inpaint import build_latent_mask

    duration = 1.0 if args.tiny else args.duration
    if args.wav:
        sr, audio = read_wav(args.wav)
    else:
        sr = runtime.config.audio.sample_rate
        audio = synthetic_upload(sr, duration)

    # Reuse the sound2sound upload path for audio -> latent.
    _, _, origin_latent = Sound2SoundPipeline(runtime).encode_origin_audio(
        audio, sr, duration)

    a = runtime.config.audio
    mask_end = min(args.mask_end, duration)
    mask = build_latent_mask(
        a.latent_height, origin_latent.shape[2], a.vae_scale,
        a.time_resolution,
        mask_time_begin=min(args.mask_begin, mask_end),
        mask_time_end=mask_end,
        mask_frequency_begin=0,
        mask_frequency_end=a.latent_height,  # all frequencies
        inpaint_area="masked",
    )
    pipe = InpaintPipeline(runtime)
    result = pipe(origin_latent, mask, args.prompt, args.negative_prompt,
                  batchsize=args.batch, steps=args.steps, cfg=args.cfg,
                  sampler=args.sampler, seed=args.seed)
    kept = float(mask.mean())
    print(f"mask keeps {kept:.0%} of the latent; audio {result.audio.shape}")
    save_outputs(args.out, "inpaint", result)


if __name__ == "__main__":
    main()
