"""Gradio web app: the reference's four task tabs on the TPU pipelines.

Reference: app.py + webUI/natural_language_guided_4/{text2sound,
sound2sound_with_text, inpaint_with_text, note2music, gradio_webUI}.py.
gradio is optional; `python -m diffusynth_tpu.ui.app --demo` runs a headless
demo of all four tasks and writes WAVs instead.

Shared control ranges mirror the reference's GradioWebUI factories
(gradio_webUI.py:57-94): steps 10-100 (default 20), batch 1-16, duration
0.25-8 s, CFG 0-20 (default 6), noising strength 0-1, ddim/ddpm.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Dict, Optional

import numpy as np

from diffusynth_tpu.configs import AppConfig
from diffusynth_tpu.midi import MidiFile
from diffusynth_tpu.pipelines import (
    DiffuSynthRuntime,
    InpaintPipeline,
    Sound2SoundPipeline,
    Text2SoundPipeline,
    TrackRenderPipeline,
)
from diffusynth_tpu.pipelines.inpaint import build_latent_mask
from diffusynth_tpu.pipelines.track_render import InstrumentConfig
from diffusynth_tpu.ui.display import (
    latent_to_image,
    phase_to_image,
    resize_image_to_aspect_ratio,
    spectrogram_to_image,
)
from diffusynth_tpu.ui.presets import load_presets


def build_app(runtime: DiffuSynthRuntime, gan_generator=None):
    """Assemble the gr.Blocks app (reference: app.py:72-91).

    gan_generator: optional one-shot GAN generator (nn/gan.py) accepted
    for parity with the reference's GradioWebUI plumbing (app.py:66 —
    which passes None in production too); when provided it is kept on the
    returned Blocks as `demo.gan_generator` for extensions."""
    import gradio as gr

    text2sound = Text2SoundPipeline(runtime)
    sound2sound = Sound2SoundPipeline(runtime)
    inpaint = InpaintPipeline(runtime)
    track_render = TrackRenderPipeline(runtime)
    instruments, midis = load_presets(runtime)
    a = runtime.config.audio

    last_result = {}  # most recent generation, for save-as-instrument

    def _result_to_outputs(res, index=0):
        last_result["res"] = res
        spec = spectrogram_to_image(np.asarray(res.spectrograms[index]))
        phase = phase_to_image(np.asarray(res.spectrograms[index]))
        return (
            resize_image_to_aspect_ratio(spec),
            resize_image_to_aspect_ratio(phase),
            (res.sample_rate, res.audio[index]),
        )

    with gr.Blocks(theme=gr.themes.Soft()) as demo:
        gr.Markdown("# DiffuSynth-TPU")

        with gr.Tab("Text2Sound"):
            prompt = gr.Textbox(label="Prompt", value="a bright organ")
            negative = gr.Textbox(label="Negative prompt", value="")
            with gr.Row():
                steps = gr.Slider(10, 100, value=20, step=1, label="Steps")
                duration = gr.Slider(0.25, 8.0, value=3.0, step=0.25,
                                     label="Duration (s)")
                batch = gr.Slider(1, 16, value=4, step=1, label="Batch size")
            with gr.Row():
                cfg = gr.Slider(0, 20, value=6, step=0.5, label="CFG scale")
                # dpmpp (DPM-Solver++ 2M) is a framework extension over the
                # reference's ddim/ddpm radio (gradio_webUI.py:64-66):
                # ~50-step-DDIM quality at 15-25 steps.
                sampler = gr.Radio(["ddim", "ddpm", "dpmpp"], value="ddim",
                                   label="Sampler")
                seed = gr.Number(value=0, label="Seed", precision=0)
            out_spec = gr.Image(label="Spectrogram")
            out_phase = gr.Image(label="Phase")
            out_audio = gr.Audio(label="Audio")
            # Batch browsing (reference: text2sound.py index slider).
            sample_index = gr.Slider(0, 15, value=0, step=1,
                                     label="Sample index")
            gr.Button("Generate").click(
                lambda p, n, s, d, b, c, sm, sd: _result_to_outputs(
                    text2sound(p, n, int(b), float(d), int(s), float(c),
                               sm, int(sd))),
                [prompt, negative, steps, duration, batch, cfg, sampler, seed],
                [out_spec, out_phase, out_audio],
            )

            def _browse(idx):
                if "res" not in last_result:
                    return None, None, None
                res = last_result["res"]
                idx = min(int(idx), res.audio.shape[0] - 1)
                return _result_to_outputs(res, index=idx)

            sample_index.change(_browse, [sample_index],
                                [out_spec, out_phase, out_audio])
            with gr.Row():
                inst_name = gr.Textbox(label="Save as instrument",
                                       value="my_instrument")
                save_status = gr.Markdown("")

            def _save_instrument(name):
                from diffusynth_tpu.ui.instruments import add_instrument

                if "res" not in last_result:
                    return "Generate a sound first."
                add_instrument(last_result["res"], instruments, name)
                return f"Saved '{name}' ({len(instruments)} instruments)."

            gr.Button("Save").click(_save_instrument, [inst_name],
                                    [save_status])

        with gr.Tab("Sound2Sound"):
            src = gr.Audio(label="Source audio", type="numpy")
            s2s_prompt = gr.Textbox(label="Prompt", value="warm strings")
            s2s_negative = gr.Textbox(label="Negative prompt", value="")
            with gr.Row():
                s2s_strength = gr.Slider(0.05, 1.0, value=0.7,
                                         label="Noising strength")
                s2s_steps = gr.Slider(10, 100, value=20, step=1, label="Steps")
                s2s_cfg = gr.Slider(0, 20, value=6, step=0.5, label="CFG")
            s2s_seed = gr.Number(value=0, label="Seed", precision=0)
            s2s_spec = gr.Image(label="Spectrogram")
            s2s_phase = gr.Image(label="Phase")
            s2s_audio = gr.Audio(label="Audio")

            def _s2s(audio_in, p, n, strength, st, c, sd):
                sr, wave = audio_in
                wave = np.asarray(wave, dtype=np.float32)
                if wave.ndim == 2:
                    wave = wave.mean(axis=1)
                if wave.dtype == np.int16 or np.abs(wave).max() > 2.0:
                    wave = wave / 32768.0
                _, _, zq = sound2sound.encode_origin_audio(wave, sr)
                res = sound2sound(zq, p, n, batchsize=1,
                                  noising_strength=float(strength),
                                  steps=int(st), cfg=float(c), seed=int(sd))
                return _result_to_outputs(res)

            gr.Button("Transform").click(
                _s2s,
                [src, s2s_prompt, s2s_negative, s2s_strength, s2s_steps,
                 s2s_cfg, s2s_seed],
                [s2s_spec, s2s_phase, s2s_audio],
            )

        with gr.Tab("Inpaint"):
            inp_src = gr.Audio(label="Source audio", type="numpy")
            inp_prompt = gr.Textbox(label="Prompt", value="bells")
            # Paintable mask editor (reference: inpaint_with_text.py:205-214
            # — gr.ImageEditor transparency layers are averaged into the
            # mask). The background fills with the source spectrogram on
            # upload; painted layers union with the sliders below.
            inp_editor = gr.ImageEditor(
                label="Paint mask on the spectrogram (optional)",
                value=None)

            def _editor_background(audio_in):
                sr, wave = audio_in
                wave = np.asarray(wave, dtype=np.float32)
                if wave.ndim == 2:
                    wave = wave.mean(axis=1)
                if wave.dtype == np.int16 or np.abs(wave).max() > 2.0:
                    wave = wave / 32768.0
                enc, _, _ = sound2sound.encode_origin_audio(wave, sr)
                spec = spectrogram_to_image(np.asarray(enc[0]))
                return {"background": spec, "layers": [], "composite": None}

            inp_src.change(_editor_background, [inp_src], [inp_editor])
            with gr.Row():
                t0s = gr.Slider(0, 8, value=1.0, label="Mask time begin (s)")
                t1s = gr.Slider(0, 8, value=2.0, label="Mask time end (s)")
                f0s = gr.Slider(0, 128, value=0, step=1,
                                label="Mask freq begin")
                f1s = gr.Slider(0, 128, value=128, step=1,
                                label="Mask freq end")
            area = gr.Radio(["masked", "unmasked"], value="masked",
                            label="Inpaint area")
            with gr.Row():
                inp_steps = gr.Slider(10, 100, value=20, step=1, label="Steps")
                inp_cfg = gr.Slider(0, 20, value=6, step=0.5, label="CFG")
                inp_seed = gr.Number(value=0, label="Seed", precision=0)
            inp_spec = gr.Image(label="Spectrogram")
            inp_audio = gr.Audio(label="Audio")

            def _drawn_layers(editor_value, width):
                """ImageEditor value -> pixel-space alpha layers at the
                spectrogram resolution (F, vae_scale*W), or None. The
                editor may rescale for display; resample each layer back
                to the spectrogram grid so the 1/vae_scale zoom in
                build_latent_mask lands on the latent grid."""
                if not editor_value:
                    return None
                layers = editor_value.get("layers") or []
                out = []
                target = (a.freq_resolution, a.vae_scale * width)
                for layer in layers:
                    arr = np.asarray(layer, dtype=np.float32)
                    if arr.ndim == 3:
                        arr = arr[:, :, -1]       # alpha channel
                    if arr.shape != target:
                        from scipy.ndimage import zoom as _zoom

                        arr = _zoom(arr, (target[0] / arr.shape[0],
                                          target[1] / arr.shape[1]),
                                    order=0)[:target[0], :target[1]]
                    if arr.any():
                        out.append(arr)
                return out or None

            def _inpaint(audio_in, editor_value, p, tb, te, fb, fe, ar, st,
                         c, sd):
                sr, wave = audio_in
                wave = np.asarray(wave, dtype=np.float32)
                if wave.ndim == 2:
                    wave = wave.mean(axis=1)
                if np.abs(wave).max() > 2.0:
                    wave = wave / 32768.0
                _, _, zq = sound2sound.encode_origin_audio(wave, sr)
                mask = build_latent_mask(
                    a.latent_height, zq.shape[2], a.vae_scale,
                    a.time_resolution,
                    drawn_layers=_drawn_layers(editor_value, zq.shape[2]),
                    mask_time_begin=tb, mask_time_end=te,
                    mask_frequency_begin=fb // a.vae_scale,
                    mask_frequency_end=fe // a.vae_scale, inpaint_area=ar,
                )
                res = inpaint(zq, mask, p, steps=int(st), cfg=float(c),
                              seed=int(sd))
                spec = spectrogram_to_image(np.asarray(res.spectrograms[0]))
                return (resize_image_to_aspect_ratio(spec),
                        (res.sample_rate, res.audio[0]))

            gr.Button("Inpaint").click(
                _inpaint,
                [inp_src, inp_editor, inp_prompt, t0s, t1s, f0s, f1s, area,
                 inp_steps, inp_cfg, inp_seed],
                [inp_spec, inp_audio],
            )

        with gr.Tab("Arrangement"):
            midi_choice = gr.Dropdown(list(midis), value=list(midis)[0],
                                      label="Preset MIDI")
            midi_upload = gr.File(label="...or upload a MIDI file")
            default_instrument = list(instruments)[0]
            instrument_choice = gr.Dropdown(
                list(instruments), value=default_instrument,
                label="Default instrument (tracks without a selection)")
            gr.Button("Refresh instruments").click(
                lambda: gr.update(choices=list(instruments)), [],
                [instrument_choice])
            # Per-track instrument names; [] = every track plays the
            # default. Mirrors the reference's current_instruments_state
            # (note2music.py:145,188-212).
            track_instruments = gr.State([])

            @gr.render(inputs=[midi_choice, midi_upload])
            def _per_track_dropdowns(midi_name, upload):
                path = (upload.name if upload is not None
                        else midis[midi_name])
                mid = MidiFile.from_file(path)
                dropdowns = [
                    gr.Dropdown(
                        list(instruments), value=default_instrument,
                        label=f"Track {i}: {len(t.note_events)} notes")
                    for i, t in enumerate(mid.tracks)
                ]

                def _select(*names):
                    return list(names)

                for d in dropdowns:
                    d.change(_select, dropdowns, [track_instruments])

            max_notes = gr.Slider(1, 1000, value=100, step=1,
                                  label="Max notes per track")
            arr_steps = gr.Slider(4, 50, value=10, step=1,
                                  label="Sample steps per note")
            arr_velocity = gr.Slider(
                0.0, 2.0, value=0.0, step=0.1,
                label="Velocity sensitivity (0 = ignore velocity, "
                      "reference behavior)")
            arr_audio = gr.Audio(label="Rendered track")

            def _arrange(midi_name, upload, per_track, default, mn, st, vs):
                path = (upload.name if upload is not None
                        else midis[midi_name])
                mid = MidiFile.from_file(path)
                names = list(per_track) if per_track else []
                # Pad/crop against stale state after a MIDI switch.
                names = (names + [default] * len(mid.tracks))[:len(mid.tracks)]
                cfgs = {
                    n: InstrumentConfig(
                        latent=instruments[n]["latent_representation"],
                        sample_steps=int(st),
                        velocity_sensitivity=float(vs),
                    )
                    for n in set(names)
                }
                audio = track_render.render(mid, cfgs, names,
                                            max_notes=int(mn))
                peak = np.abs(audio).max()
                return (a.sample_rate, audio / peak if peak > 0 else audio)

            gr.Button("Make track").click(
                _arrange,
                [midi_choice, midi_upload, track_instruments,
                 instrument_choice, max_notes, arr_steps, arr_velocity],
                [arr_audio],
            )

        with gr.Tab("README"):
            # Usage docs at parity with the reference's README tab
            # (webUI/natural_language_guided_4/README.py:1-40), written
            # for this rebuild.
            gr.Markdown(
                "## DiffuSynth-TPU — text-guided generation of musical "
                "notes with a latent diffusion model\n"
                "\n"
                "TPU-native rebuild (JAX/XLA) of DiffuSynth v0.2; the tabs "
                "mirror the reference app.\n"
                "\n"
                "### Training data\n"
                "The model trains on the filtered NSynth dataset, whose "
                "labels seed the caption vocabulary:\n\n"
                "- **Instrument families**: bass, brass, flute, guitar, "
                "keyboard, mallet, organ, reed, string, synth lead, "
                "vocal.\n"
                "- **Instrument sources**: acoustic, electronic, "
                "synthetic.\n"
                "- **Note qualities**: bright, dark, distortion, fast "
                "decay, long release, multiphonic, nonlinear env, "
                "percussive, reverb, tempo-synced.\n\n"
                "You are not limited to these terms — with a CLAP text "
                "encoder the model accepts natural-language prompts.\n"
                "\n"
                "### Usage hints\n"
                "1. **Unique sounds** — start generating in Text2Sound.\n"
                "2. **Batch browsing** — raise the batch size and audition "
                "the variations.\n"
                "3. **Editing sounds** — download generated audio and "
                "re-upload it in Sound2Sound (text-guided img2img over "
                "the noising-strength slider) or Inpaint (paint the mask "
                "on the spectrogram, or use the time/frequency sliders; "
                "'masked' repaints the selection, 'unmasked' preserves "
                "it). You can also upload or record audio from any "
                "source.\n"
                "4. **Arrangement** — save a satisfying timbre with the "
                "'Save' button, upload a MIDI file in the Arrangement "
                "tab, assign the saved timbre per track, and render the "
                "piece. Rendering batches every note over the device "
                "mesh (unlike the reference's serial per-note loop).\n"
                "\n"
                "### Serving\n"
                "The same pipelines serve over HTTP with request "
                "coalescing: `python -m diffusynth_tpu.serving.server` "
                "(see docs/API.md)."
            )

    demo.gan_generator = gan_generator
    return demo


def run_headless_demo(runtime: DiffuSynthRuntime, out_dir: str = "/tmp"):
    """Exercise all four task pipelines without gradio; writes WAVs."""
    from scipy.io import wavfile

    a = runtime.config.audio
    print("== text2sound ==", flush=True)
    t2s = Text2SoundPipeline(runtime)
    res = t2s("a bright organ", "noise", batchsize=2, duration_sec=3.0,
              steps=10, cfg=6.0, seed=0)
    wavfile.write(os.path.join(out_dir, "demo_text2sound.wav"),
                  a.sample_rate, res.audio[0])

    print("== sound2sound ==", flush=True)
    s2s = Sound2SoundPipeline(runtime)
    res2 = s2s(res.quantized[:1], "warm strings", steps=10,
               noising_strength=0.5, cfg=3.0, seed=1)
    wavfile.write(os.path.join(out_dir, "demo_sound2sound.wav"),
                  a.sample_rate, res2.audio[0])

    print("== inpaint ==", flush=True)
    inp = InpaintPipeline(runtime)
    width = res.quantized.shape[2]
    mask = build_latent_mask(a.latent_height, width, a.vae_scale,
                             a.time_resolution, mask_time_begin=1.0,
                             mask_time_end=2.0, mask_frequency_begin=0,
                             mask_frequency_end=a.latent_height,
                             inpaint_area="unmasked")
    res3 = inp(res.quantized[:1], mask, "bells", steps=10, cfg=3.0, seed=2)
    wavfile.write(os.path.join(out_dir, "demo_inpaint.wav"),
                  a.sample_rate, res3.audio[0])

    print("== arrangement ==", flush=True)
    instruments, midis = load_presets(runtime)
    tr = TrackRenderPipeline(runtime)
    mid = MidiFile.from_file(list(midis.values())[0])
    name = "preset_organ"
    cfg = InstrumentConfig(
        latent=instruments[name]["latent_representation"], sample_steps=6)
    audio = tr.render(mid, {name: cfg}, [name] * len(mid.tracks),
                      max_notes=16)
    peak = np.abs(audio).max()
    wavfile.write(os.path.join(out_dir, "demo_track.wav"), a.sample_rate,
                  (audio / peak if peak > 0 else audio).astype(np.float32))
    print(f"demo WAVs written to {out_dir}", flush=True)


def main(argv=None):
    parser = argparse.ArgumentParser(description="DiffuSynth-TPU app")
    parser.add_argument("--demo", action="store_true",
                        help="headless demo (no gradio)")
    parser.add_argument("--share", action="store_true")
    parser.add_argument("--out-dir", default="/tmp")
    args = parser.parse_args(argv)

    runtime = DiffuSynthRuntime(AppConfig())
    if args.demo:
        run_headless_demo(runtime, args.out_dir)
        return
    try:
        import gradio  # noqa: F401
    except ImportError:
        print("gradio is not installed; run with --demo for the headless "
              "demo.", file=sys.stderr)
        sys.exit(1)
    build_app(runtime).launch(share=args.share)


if __name__ == "__main__":
    main()
