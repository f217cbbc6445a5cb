"""The examples/ scripts must stay runnable (they are the user-facing API
documentation). Each runs in a subprocess with --tiny --cpu, exactly as the
README tells a new user to."""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = os.path.join(REPO, "examples")


def _run(script, *extra, env_extra=None):
    env = dict(os.environ)
    # The conftest env (JAX_PLATFORMS/XLA_FLAGS) is inherited; --cpu also
    # forces the platform via jax.config for TPU-attached environments.
    env.update(env_extra or {})
    out = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, script),
         "--tiny", "--cpu", *extra],
        capture_output=True, text=True, timeout=900, cwd=EXAMPLES, env=env)
    assert out.returncode == 0, f"{script} failed:\n{out.stdout}\n{out.stderr}"
    return out.stdout


def test_text2sound_example(tmp_path):
    out = _run("text2sound.py", "--batch", "2", "--steps", "3",
               "--sampler", "dpmpp", "--out", str(tmp_path))
    assert "latents (2, 16, 4, 4)" in out
    assert (tmp_path / "text2sound_1.wav").exists()


def test_sound2sound_example(tmp_path):
    out = _run("sound2sound.py", "--batch", "1", "--steps", "3",
               "--out", str(tmp_path))
    assert "origin latent (1, 16, 4, 4)" in out
    assert (tmp_path / "sound2sound_0.wav").exists()


def test_inpaint_example(tmp_path):
    out = _run("inpaint.py", "--batch", "1", "--steps", "3",
               "--mask-begin", "0.3", "--mask-end", "0.7",
               "--out", str(tmp_path))
    # The time/frequency rectangle must actually select latent columns.
    assert "mask keeps 100%" not in out
    assert (tmp_path / "inpaint_0.wav").exists()


def test_render_midi_example(tmp_path):
    out = _run("render_midi.py", "--steps", "2", "--max-notes", "4",
               "--out", str(tmp_path))
    assert "rendered 1 track(s)" in out
    assert (tmp_path / "track.wav").exists()


def test_interpolate_example(tmp_path):
    out = _run("interpolate.py", "--batch", "3", "--steps", "3",
               "--out", str(tmp_path))
    assert "3 interpolation points" in out
    assert (tmp_path / "interpolate_2.wav").exists()


def test_multichip_example(tmp_path):
    out = _run("multichip_inference.py", "--batch", "8", "--steps", "3",
               "--out", str(tmp_path))
    assert "8 devices" in out
    assert (tmp_path / "multichip_7.wav").exists()


def test_finetune_lora_example(tmp_path):
    out = _run("finetune_lora.py", "--iters", "6", "--out", str(tmp_path))
    assert "adapter:" in out and "adapter loss" in out
    assert "baked-in weight delta max" in out
    assert (tmp_path / "finetune_lora_0.wav").exists()
    assert (tmp_path / "models" / "unet_ft_UNet_lora").exists()
