"""End-to-end pipeline tests on a miniature model geometry (CPU-friendly)."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from diffusynth_tpu.configs import (
    AppConfig,
    AudioConfig,
    DiffusionConfig,
    UNetConfig,
    VQGANConfig,
)
from diffusynth_tpu.midi import MidiFile
from diffusynth_tpu.midi.parser import write_midi
from diffusynth_tpu.pipelines import (
    DiffuSynthRuntime,
    InpaintPipeline,
    Sound2SoundPipeline,
    Text2SoundPipeline,
    TrackRenderPipeline,
)
from diffusynth_tpu.pipelines.inpaint import build_latent_mask
from diffusynth_tpu.pipelines.track_render import InstrumentConfig
from diffusynth_tpu.text import HashTextEncoder, CachedTextEncoder


def tiny_config() -> AppConfig:
    """Miniature geometry: 64-bin spectrograms, 16x W latents."""
    return AppConfig(
        audio=AudioConfig(
            sample_rate=4000, n_fft=128, hop_length=32, win_length=128,
            freq_resolution=64, time_resolution=32, vae_scale=4,
            channels=4, latent_height=16,
        ),
        vqgan=VQGANConfig(
            hidden_channels=(8, 16), attn_pos=(), num_embeddings=32,
            num_groups=4,
        ),
        unet=UNetConfig(
            down_dims=(8, 8, 16, 32), up_dims=(32, 32, 16, 8),
            label_emb_dim=16,
        ),
        diffusion=DiffusionConfig(
            timesteps=50, height=16, channels=4, train_width=8, max_width=32,
        ),
        compute_dtype="float32",
    )


@pytest.fixture(scope="module")
def runtime():
    return DiffuSynthRuntime(
        tiny_config(), text_encoder=CachedTextEncoder(HashTextEncoder(16)),
        seed=0,
    )


class TestTextEncoders:
    def test_hash_encoder_deterministic_and_distinct(self):
        enc = HashTextEncoder(32)
        a = enc.encode(["organ", "organ", "violin"])
        assert a.shape == (3, 32)
        np.testing.assert_allclose(a[0], a[1])
        assert not np.allclose(a[0], a[2])
        np.testing.assert_allclose(np.linalg.norm(a, axis=1), 1.0, rtol=1e-5)

    def test_cache(self):
        calls = []

        class Spy:
            feature_dim = 8

            def encode(self, prompts):
                calls.append(list(prompts))
                return np.zeros((len(prompts), 8), dtype=np.float32)

        c = CachedTextEncoder(Spy())
        c.encode(["a", "b"])
        c.encode(["a", "b", "c"])
        assert calls == [["a", "b"], ["c"]]


class TestRuntime:
    def test_encode_decode_roundtrip_shapes(self, runtime):
        a = runtime.config.audio
        width = 8
        audio = jnp.asarray(
            np.random.default_rng(0).standard_normal(
                (2, a.audio_length_from_width(width))
            ).astype(np.float32)
        )
        enc, z, zq = runtime.encode_audio(audio)
        assert enc.shape == (2, 64, 32, 3)
        assert z.shape == (2, 16, 8, 4)
        assert zq.shape == z.shape
        spect, rec_audio = runtime.decode_latents(zq, quantize=False)
        assert spect.shape == (2, 64, 32, 3)
        assert rec_audio.shape == (2, a.audio_length_from_width(width))

    def test_decode_int16_matches_host_conversion(self, runtime):
        """audio_format="int16" must produce exactly the WAV-writer bytes
        (native dsyn_wav_write: clip [-1,1], round-half-even * 32767)."""
        a = runtime.config.audio
        audio = jnp.asarray(
            np.random.default_rng(1).standard_normal(
                (2, a.audio_length_from_width(8))
            ).astype(np.float32)
        )
        _, _, zq = runtime.encode_audio(audio)
        _, f32 = runtime.decode_latents(zq, quantize=False)
        _, i16 = runtime.decode_latents(zq, quantize=False,
                                        audio_format="int16")
        assert i16.dtype == jnp.int16
        host = np.round(
            np.clip(np.asarray(f32), -1.0, 1.0) * 32767.0
        ).astype(np.int16)
        np.testing.assert_array_equal(np.asarray(i16), host)


class TestText2Sound:
    def test_generate(self, runtime):
        pipe = Text2SoundPipeline(runtime)
        res = pipe("a bright organ", "noisy", batchsize=2,
                   duration_sec=1.0, steps=4, cfg=3.0, seed=7)
        a = runtime.config.audio
        width = a.width_from_duration(1.0)
        assert res.latents.shape == (2, 16, width, 4)
        assert res.audio.shape == (2, a.audio_length_from_width(width))
        assert np.isfinite(res.audio).all()
        assert res.sample_rate == a.sample_rate

    def test_seed_determinism(self, runtime):
        pipe = Text2SoundPipeline(runtime)
        r1 = pipe("pluck", steps=3, cfg=1.0, seed=5, duration_sec=1.0)
        r2 = pipe("pluck", steps=3, cfg=1.0, seed=5, duration_sec=1.0)
        np.testing.assert_allclose(
            np.asarray(r1.latents), np.asarray(r2.latents)
        )
        r3 = pipe("pluck", steps=3, cfg=1.0, seed=6, duration_sec=1.0)
        assert not np.allclose(np.asarray(r1.latents), np.asarray(r3.latents))


class TestSound2Sound:
    def test_encode_and_transfer(self, runtime):
        pipe = Sound2SoundPipeline(runtime)
        a = runtime.config.audio
        rng = np.random.default_rng(1)
        raw = rng.standard_normal(6000).astype(np.float32)
        enc, z, zq = pipe.encode_origin_audio(raw, 8000, duration_sec=1.0)
        width = a.width_from_duration(1.0)
        assert zq.shape == (1, 16, width, 4)
        res = pipe(zq, "warm pad", batchsize=2, noising_strength=0.5,
                   steps=4, cfg=1.0, seed=3)
        assert res.latents.shape == (2, 16, width, 4)
        assert np.isfinite(res.audio).all()

    def test_audio_format_int16(self, runtime):
        """audio_format threads through to the device-side PCM16 path."""
        pipe = Sound2SoundPipeline(runtime)
        rng = np.random.default_rng(1)
        raw = rng.standard_normal(6000).astype(np.float32)
        _, _, zq = pipe.encode_origin_audio(raw, 8000, duration_sec=1.0)
        res = pipe(zq, "warm pad", batchsize=1, noising_strength=0.5,
                   steps=2, cfg=1.0, seed=3, audio_format="int16")
        assert res.audio.dtype == np.int16
        assert np.abs(res.audio).max() <= 32767


class TestInpaint:
    def test_mask_construction(self):
        drawn = [np.zeros((64, 32, 4), dtype=np.float32)]
        drawn[0][10:20, 5:9, 3] = 1.0  # alpha channel blob
        m = build_latent_mask(
            16, 8, 4, 32, drawn_layers=drawn, inpaint_area="masked",
        )
        assert m.shape == (16, 8)
        # Spline zoom gives soft edges, clipped to [0, 1] (same as reference).
        assert (m >= 0).all() and (m <= 1).all()
        # "masked": drawn region becomes ~0 (repaint), remainder 1 (keep).
        assert m.mean() > 0.5
        assert m.min() < 0.7  # the drawn blob is present after inversion

    def test_mask_slider_rectangle_unmasked(self):
        m = build_latent_mask(
            16, 8, 4, 32,
            mask_time_begin=0.0, mask_time_end=4.0,
            mask_frequency_begin=0, mask_frequency_end=16,
            inpaint_area="unmasked",
        )
        # Whole rectangle marked keep=1 (unmasked keeps the selection).
        np.testing.assert_allclose(m, 1.0)

    def test_inpaint_run_freezes_kept_region(self, runtime):
        pipe = InpaintPipeline(runtime)
        width = 8
        guide = jnp.asarray(
            np.random.default_rng(2).standard_normal((1, 16, width, 4))
            .astype(np.float32)
        )
        mask = np.zeros((16, width), dtype=np.float32)
        mask[:, :3] = 1.0  # keep the first 3 columns
        res = pipe(guide, mask, "bells", steps=4, cfg=1.0,
                   noising_strength=1.0, seed=1)
        np.testing.assert_allclose(
            np.asarray(res.latents[:, :, :3, :]),
            np.asarray(guide[:, :, :3, :]), atol=1e-5,
        )

    def test_audio_format_int16(self, runtime):
        """audio_format threads through to the device-side PCM16 path."""
        pipe = InpaintPipeline(runtime)
        guide = jnp.asarray(
            np.random.default_rng(2).standard_normal((1, 16, 8, 4))
            .astype(np.float32)
        )
        mask = np.zeros((16, 8), dtype=np.float32)
        res = pipe(guide, mask, "bells", steps=2, cfg=1.0,
                   noising_strength=1.0, seed=1, audio_format="int16")
        assert res.audio.dtype == np.int16
        assert np.abs(res.audio).max() <= 32767


class TestMidi:
    def test_write_parse_roundtrip(self, tmp_path):
        path = str(tmp_path / "test.mid")
        notes = [(60, 100, 0, 480), (64, 90, 480, 240), (52, 80, 720, 960)]
        write_midi(path, notes, ticks_per_beat=480)
        mid = MidiFile.from_file(path)
        assert mid.ticks_per_beat == 480
        evs = mid.tracks[0].note_events
        assert [(e.note, e.start_time, e.duration) for e in evs] == [
            (60, 0, 480), (64, 480, 240), (52, 720, 960),
        ]

    def test_tempo_events(self, tmp_path):
        path = str(tmp_path / "t.mid")
        write_midi(path, [(60, 100, 0, 480)], tempo=250_000)
        mid = MidiFile.from_file(path)
        tempos = [t.tempo for t in mid.tracks[0].tempo_events]
        assert 250_000 in tempos


class TestTrackRender:
    def test_render_simple_track(self, runtime, tmp_path):
        path = str(tmp_path / "track.mid")
        # Three 3s notes, two share a pitch+duration (exercises dedupe).
        write_midi(path, [(52, 100, 0, 2880), (59, 100, 2880, 2880),
                          (52, 100, 5760, 2880)], ticks_per_beat=480)
        mid = MidiFile.from_file(path)

        rng = np.random.default_rng(0)
        latent = jnp.asarray(
            rng.standard_normal((1, 16, 8, 4)).astype(np.float32)
        )
        pipe = TrackRenderPipeline(runtime)
        instruments = {"piano": InstrumentConfig(latent=latent, sample_steps=3)}
        audio = pipe.render(mid, instruments, ["piano"], max_notes=10)
        sr = runtime.config.audio.sample_rate
        assert audio.ndim == 1
        assert len(audio) > 10 * sr  # includes the safety tail
        assert np.isfinite(audio).all()
        assert np.abs(audio).max() > 0  # notes actually mixed in

    def test_velocity_sensitivity(self, runtime, tmp_path):
        """velocity_sensitivity=0 ignores velocity exactly like the
        reference (track_maker.py:229-283); >0 scales note gain by
        (velocity/127)**s."""
        path = str(tmp_path / "vel.mid")
        # Same pitch+duration at two velocities, non-overlapping in time
        # (track buffers are sized by summed durations + tail, so starts
        # must stay inside that envelope).
        write_midi(path, [(52, 127, 0, 2880), (52, 32, 4800, 2880)],
                   ticks_per_beat=480)
        mid = MidiFile.from_file(path)
        latent = jnp.asarray(np.random.default_rng(0)
                             .standard_normal((1, 16, 8, 4))
                             .astype(np.float32))
        sr = runtime.config.audio.sample_rate

        def render(sens):
            pipe = TrackRenderPipeline(runtime)
            cfg = InstrumentConfig(latent=latent, sample_steps=3,
                                   velocity_sensitivity=sens)
            return pipe.render(mid, {"p": cfg}, ["p"], seed=7)

        flat = render(0.0)
        dyn = render(1.0)
        # Identical pitch/duration -> identical rendered note; only the
        # gain differs. First note spans [0, ~3 s); the second starts at
        # 4800 ticks * (0.5 s / 480 ticks) = 5 s.
        n1 = slice(0, 3 * sr)
        n2 = slice(5 * sr, 8 * sr)
        np.testing.assert_allclose(dyn[n1], flat[n1], atol=1e-6)  # v=127
        rms = lambda x: float(np.sqrt(np.mean(x ** 2)))
        assert rms(flat[n2]) > 0
        np.testing.assert_allclose(rms(dyn[n2]) / rms(flat[n2]), 32 / 127,
                                   rtol=1e-3)
