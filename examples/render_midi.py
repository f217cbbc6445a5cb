"""Render a MIDI file to music with generated instruments
(reference: arrangement tab / track_maker.py).

  python examples/render_midi.py --tiny --cpu
  python examples/render_midi.py --midi song.mid --instrument preset_organ

Unlike the reference's serial per-note loop (one diffusion run per unique
note duration, one librosa pitch-shift per note), rendering here batches all
notes by latent width into a handful of device launches, pitch-shifts the
whole batch in one vocoder call, and mixes down in C++.
"""

from __future__ import annotations

import numpy as np

from _common import base_parser, make_runtime


def main():
    p = base_parser(__doc__)
    p.add_argument("--midi", default=None,
                   help="MIDI path (default: the bundled Ode to Joy preset)")
    p.add_argument("--instrument", default="preset_organ",
                   help="preset name, e.g. preset_organ / preset_string")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--max-notes", type=int, default=100)
    p.add_argument("--seed", type=int, default=1234)
    args = p.parse_args()

    runtime = make_runtime(args)
    from diffusynth_tpu.midi import MidiFile
    from diffusynth_tpu.native import write_wav
    from diffusynth_tpu.pipelines import TrackRenderPipeline
    from diffusynth_tpu.pipelines.track_render import InstrumentConfig
    from diffusynth_tpu.ui.presets import load_presets

    instruments, preset_midis = load_presets(runtime)
    if args.instrument not in instruments:
        raise SystemExit(f"unknown instrument {args.instrument!r}; "
                         f"presets: {sorted(instruments)}")
    midi_path = args.midi or preset_midis["Ode_to_Joy_Easy_variation"]
    mid = MidiFile.from_file(midi_path)

    cfg = InstrumentConfig(
        latent=instruments[args.instrument]["latent_representation"],
        sample_steps=args.steps)
    pipe = TrackRenderPipeline(runtime)
    audio = pipe.render(mid, {args.instrument: cfg},
                        [args.instrument] * len(mid.tracks),
                        max_notes=args.max_notes, seed=args.seed)

    peak = np.abs(audio).max()
    if peak > 0:
        audio = (audio / peak).astype(np.float32)
    import os

    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "track.wav")
    write_wav(path, audio, runtime.config.audio.sample_rate)
    print(f"rendered {len(mid.tracks)} track(s) -> {path} "
          f"({len(audio) / runtime.config.audio.sample_rate:.1f}s)")


if __name__ == "__main__":
    main()
