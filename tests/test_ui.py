"""UI layer tests: presets, display conversions, headless demo (tiny model)."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from diffusynth_tpu.midi import MidiFile
from diffusynth_tpu.pipelines import DiffuSynthRuntime
from diffusynth_tpu.text import CachedTextEncoder, HashTextEncoder
from diffusynth_tpu.ui.display import (
    latent_to_image,
    phase_to_image,
    resize_image_to_aspect_ratio,
    spectrogram_to_image,
)
from diffusynth_tpu.ui.presets import (
    load_presets,
    synthesize_instrument_wave,
    _INSTRUMENT_RECIPES,
)
from tests.test_pipelines import tiny_config


@pytest.fixture(scope="module")
def runtime():
    return DiffuSynthRuntime(
        tiny_config(), text_encoder=CachedTextEncoder(HashTextEncoder(16)),
        seed=0,
    )


class TestPresets:
    def test_instrument_synthesis(self):
        for name in _INSTRUMENT_RECIPES:
            wave = synthesize_instrument_wave(name, 4000, duration=1.0)
            assert wave.shape == (8000,)  # (duration + 1s release) * sr
            assert np.isfinite(wave).all()
            rms = np.sqrt((wave ** 2).mean())
            assert 0.05 < rms < 0.2  # RMS-normalized to ~0.1

    def test_load_presets(self, runtime):
        instruments, midis = load_presets(runtime)
        assert set(instruments) == set(_INSTRUMENT_RECIPES)
        d = runtime.config.diffusion
        for name, inst in instruments.items():
            assert inst["latent_representation"].shape == (
                1, d.height, d.train_width, d.channels)
        assert len(midis) == 3
        for path in midis.values():
            mid = MidiFile.from_file(path)
            assert mid.tracks[0].note_events  # melodies parse back


class TestDisplay:
    def test_spectrogram_to_image(self):
        enc = np.random.default_rng(0).uniform(0, 5, (64, 32, 3))
        img = spectrogram_to_image(enc)
        assert img.shape == (64, 32) and img.dtype == np.uint8
        # Vertical flip: top row of the image is the LAST frequency row.
        enc2 = np.zeros((4, 2, 3))
        enc2[3, :, 0] = 1.0
        assert spectrogram_to_image(enc2)[0].max() == 255

    def test_phase_and_latent_images(self):
        enc = np.random.default_rng(1).uniform(-1, 1, (16, 8, 3))
        assert phase_to_image(enc).shape == (16, 8)
        lat = np.random.default_rng(2).standard_normal((8, 4, 4))
        img = latent_to_image(lat)
        assert img.shape == (8, 16)  # 4 channels tiled horizontally

    def test_resize_aspect_ratio(self):
        img = np.zeros((10, 10), np.uint8)
        out = resize_image_to_aspect_ratio(img, 4, 1)
        assert out.shape == (10, 40)


class TestHeadlessDemo:
    def test_all_four_tasks(self, runtime, tmp_path):
        from diffusynth_tpu.ui.app import run_headless_demo

        run_headless_demo(runtime, str(tmp_path))
        for name in ("demo_text2sound.wav", "demo_sound2sound.wav",
                     "demo_inpaint.wav", "demo_track.wav"):
            path = tmp_path / name
            assert path.exists(), name
            assert path.stat().st_size > 1000


class TestBlocksAssembly:
    """build_app's gr.Blocks wiring, exercised against an API-faithful
    stub (tests/gradio_stub.py) — gradio itself is not installed by
    design. Verifies the reference app's tab structure (app.py:72-91)
    and drives the Text2Sound callback through the recorded wiring."""

    @pytest.fixture()
    def demo(self, runtime, monkeypatch):
        import sys

        from tests import gradio_stub

        monkeypatch.setitem(sys.modules, "gradio", gradio_stub)
        from diffusynth_tpu.ui.app import build_app

        return build_app(runtime)

    def test_tab_structure(self, demo):
        names = [t.name for t in demo.tabs]
        for expected in ("Text2Sound", "Sound2Sound", "Inpaint",
                         "Arrangement", "README"):
            assert expected in names, names
        # Every tab except README wires at least one button.
        assert len(demo.clicks) >= 4

    def test_text2sound_callback_runs(self, demo):
        # First wired click is the Text2Sound Generate button; call it
        # with the UI's default component values.
        wiring = demo.clicks[0]
        args = [c.value for c in wiring["inputs"]]
        out = wiring["fn"](*args)
        assert len(out) == len(wiring["outputs"])
        sr, audio = out[-1]          # gr.Audio output: (sample_rate, wave)
        assert sr > 0
        assert np.isfinite(audio).all()

    @staticmethod
    def _find(demo, fn_name, event="click"):
        for w in demo.clicks:
            if w["event"] == event and w["fn"].__name__ == fn_name:
                return w
        raise AssertionError(f"no {event} wiring for {fn_name}")

    def test_arrangement_per_track_dropdowns(self, demo):
        """The gr.render block creates one instrument dropdown per MIDI
        track (reference: note2music.py:188-212) whose change handler
        yields the per-track name list."""
        sel = self._find(demo, "_select", event="change")
        # The default preset MIDI is single-track -> one dropdown input.
        assert len(sel["inputs"]) == 1
        assert sel["fn"]("preset_string") == ["preset_string"]

    def test_arrangement_callback_default_and_per_track(self, demo):
        wiring = self._find(demo, "_arrange")
        midi_name = wiring["inputs"][0].value
        default = wiring["inputs"][3].value
        # Default path: empty per-track state -> default instrument on
        # every track; nonzero velocity sensitivity exercised.
        sr, audio = wiring["fn"](midi_name, None, [], default, 4, 4, 0.5)
        assert sr > 0 and np.isfinite(audio).all() and len(audio) > sr
        # Per-track path: a different instrument changes the rendering.
        other = "preset_string" if default != "preset_string" \
            else "preset_organ"
        sr2, audio2 = wiring["fn"](midi_name, None, [other], default, 4, 4,
                                   0.5)
        assert np.isfinite(audio2).all()
        n = min(len(audio), len(audio2))
        assert not np.allclose(audio[:n], audio2[:n])

    def test_inpaint_drawn_mask_wiring(self, demo, runtime):
        """The Inpaint tab's gr.ImageEditor feeds painted transparency
        layers into build_latent_mask(drawn_layers=...) (reference:
        inpaint_with_text.py:205-233): a layer painted over the left half
        of the spectrogram must produce a different result than no layer,
        and the editor background fills from the uploaded audio."""
        a = runtime.config.audio
        sr = a.sample_rate
        t = np.arange(sr) / sr
        wave = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)

        bg = self._find(demo, "_editor_background", event="change")
        editor_value = bg["fn"]((sr, wave))
        assert editor_value["background"].dtype == np.uint8
        F_px = editor_value["background"].shape[0]
        assert F_px == a.freq_resolution

        wiring = self._find(demo, "_inpaint")
        # inputs: [src, editor, prompt, t0, t1, f0, f1, area, steps, cfg,
        # seed] — use defaults except src/editor.
        defaults = [c.value for c in wiring["inputs"]]
        W_px = editor_value["background"].shape[1]
        layer = np.zeros((F_px, W_px, 4), np.float32)
        layer[:, : W_px // 2, 3] = 255.0          # paint the left half
        painted = dict(editor_value, layers=[layer])

        args_none = [(sr, wave), None] + defaults[2:]
        args_drawn = [(sr, wave), painted] + defaults[2:]
        # Small step count for CPU speed.
        args_none[8] = args_drawn[8] = 3
        spec_none, (r1, audio_none) = wiring["fn"](*args_none)
        spec_drawn, (r2, audio_drawn) = wiring["fn"](*args_drawn)
        assert r1 == r2 == sr
        assert np.isfinite(audio_none).all()
        assert np.isfinite(audio_drawn).all()
        # The painted layer unions into the mask -> different repaint
        # region -> different audio.
        assert not np.allclose(audio_none, audio_drawn)
