"""Sharded batched generation over the 8-virtual-device mesh must equal the
single-device result exactly (same program, batch split over devices)."""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from diffusynth_tpu.parallel.mesh import make_mesh
from diffusynth_tpu.pipelines import DiffuSynthRuntime, Text2SoundPipeline
from diffusynth_tpu.text import CachedTextEncoder, HashTextEncoder
from tests.test_pipelines import tiny_config


def _make_runtime(mesh=None):
    return DiffuSynthRuntime(
        tiny_config(), text_encoder=CachedTextEncoder(HashTextEncoder(16)),
        seed=0, mesh=mesh,
    )


class TestShardedInference:
    def test_text2sound_sharded_matches_single(self):
        assert jax.device_count() == 8
        kwargs = dict(prompt="organ", negative_prompt="x", batchsize=8,
                      duration_sec=1.0, steps=4, cfg=3.0, seed=5,
                      return_audio=True)

        single = Text2SoundPipeline(_make_runtime())(**kwargs)
        sharded = Text2SoundPipeline(_make_runtime(make_mesh(8)))(**kwargs)

        np.testing.assert_allclose(
            np.asarray(sharded.latents), np.asarray(single.latents),
            atol=1e-5,
        )
        np.testing.assert_allclose(sharded.audio, single.audio, atol=1e-4)

    def test_sound2sound_sharded_matches_single(self):
        """img2img path (noising_strength entry point) under the mesh."""
        import jax.numpy as jnp

        from diffusynth_tpu.pipelines import Sound2SoundPipeline

        zq = jnp.asarray(
            np.random.default_rng(4).standard_normal((1, 16, 8, 4))
            .astype(np.float32))
        kwargs = dict(prompt="warm pad", batchsize=8, noising_strength=0.5,
                      steps=4, cfg=2.0, seed=6)
        single = Sound2SoundPipeline(_make_runtime())(zq, **kwargs)
        sharded = Sound2SoundPipeline(_make_runtime(make_mesh(8)))(zq, **kwargs)
        np.testing.assert_allclose(
            np.asarray(sharded.latents), np.asarray(single.latents),
            atol=1e-5)

    def test_window_loop_sharded_matches_single(self):
        """loop_mode='window' composed with batch sharding."""
        def rt(mesh=None):
            return DiffuSynthRuntime(
                tiny_config(),
                text_encoder=CachedTextEncoder(HashTextEncoder(16)),
                seed=0, mesh=mesh, loop_mode="window")

        kwargs = dict(prompt="organ", negative_prompt="x", batchsize=8,
                      duration_sec=1.0, steps=4, cfg=3.0, seed=5,
                      return_audio=True)
        single = Text2SoundPipeline(rt())(**kwargs)
        sharded = Text2SoundPipeline(rt(make_mesh(8)))(**kwargs)
        np.testing.assert_allclose(
            np.asarray(sharded.latents), np.asarray(single.latents),
            atol=1e-5)

    def test_track_render_sharded(self, tmp_path):
        """Batched note rendering with the batch sharded over the mesh."""
        import jax.numpy as jnp

        from diffusynth_tpu.midi import MidiFile
        from diffusynth_tpu.midi.parser import write_midi
        from diffusynth_tpu.pipelines import TrackRenderPipeline
        from diffusynth_tpu.pipelines.track_render import InstrumentConfig

        path = str(tmp_path / "t.mid")
        write_midi(path, [(52, 100, 0, 2880), (59, 100, 2880, 2880)])
        mid = MidiFile.from_file(path)
        latent = jnp.asarray(
            np.random.default_rng(0).standard_normal((1, 16, 8, 4))
            .astype(np.float32))
        cfg = InstrumentConfig(latent=latent, sample_steps=3)

        a1 = TrackRenderPipeline(_make_runtime()).render(
            mid, {"p": cfg}, ["p"], max_notes=4)
        a2 = TrackRenderPipeline(_make_runtime(make_mesh(8))).render(
            mid, {"p": cfg}, ["p"], max_notes=4)
        np.testing.assert_allclose(a2, a1, atol=1e-4)
