"""The python loop_mode must produce identical results to the scan mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusynth_tpu.diffusion import DiffSynthSampler
from diffusynth_tpu.diffusion.schedule import respaced_timesteps

H, C, TRAIN_W = 16, 4, 16


def _dummy_apply(params, x, t, condition):
    out = 0.1 * x + 0.001 * t.astype(jnp.float32).reshape(-1, 1, 1, 1)
    if condition is not None:
        out = out + 0.01 * jnp.mean(condition, axis=-1).reshape(-1, 1, 1, 1)
    return out


def _sampler(loop_mode, cfg=None):
    s = DiffSynthSampler(_dummy_apply, timesteps=100, height=H, channels=C,
                         train_width=TRAIN_W, max_width=64,
                         loop_mode=loop_mode)
    s.respace(list(respaced_timesteps(100, 8)))
    if cfg:
        s.activate_classifier_free_guidance(cfg, jnp.zeros(8))
    return s


@pytest.mark.parametrize("mode,cfg,sampler_name", [
    ("sample", None, "ddim"),
    ("sample", 3.0, "ddim"),
    ("sample", None, "ddpm"),
    ("inpaint", None, "ddim"),
    ("inpaint_static", None, "ddim"),
    ("inpaint", 2.0, "ddpm"),
    ("img2img", None, "ddim"),
    ("img2img", 4.0, "ddpm"),
    ("interpolate", None, "ddim"),
    ("sample", None, "dpmpp"),
    ("sample", 3.0, "dpmpp"),
    ("inpaint", None, "dpmpp"),
    ("img2img", None, "dpmpp"),
])
def test_python_loop_matches_scan(mode, cfg, sampler_name):
    shape = (2, H, 24, C)
    cond = jnp.ones((2, 8))
    key = jax.random.key(0)
    outs = {}
    for lm in ("scan", "python", "window"):   # window: 8 steps -> W=4
        s = _sampler(lm, cfg)
        if mode == "sample":
            out, _ = s.sample(None, shape, key, condition=cond,
                              sampler=sampler_name)
        elif mode == "img2img":
            guide = jnp.full((2, H, TRAIN_W, C), 0.5)
            out, _ = s.img_guided_sample(None, shape, key, 0.75, guide,
                                         condition=cond,
                                         sampler=sampler_name)
        elif mode == "inpaint_static":
            guide = jnp.full((2, H, TRAIN_W, C), 0.5)
            mask = (jnp.arange(24) < 8).astype(jnp.float32)
            mask = jnp.broadcast_to(mask.reshape(1, 1, 24, 1),
                                    (1, H, 24, 1))
            out, _ = s.inpaint_sample(None, shape, key, 1.0, guide,
                                      mask=mask, condition=cond,
                                      sampler=sampler_name)
        elif mode == "interpolate":
            out, _ = s.interpolate(None, shape, key, condition=cond,
                                   sampler=sampler_name)
        else:
            guide = jnp.full((2, H, TRAIN_W, C), 0.5)
            out, _ = s.inpaint_sample(None, shape, key, 1.0, guide,
                                      condition=cond, use_dynamic_mask=True,
                                      mask_flexivity=1.0,
                                      sampler=sampler_name)
        outs[lm] = np.asarray(out)
    np.testing.assert_allclose(outs["python"], outs["scan"], atol=1e-5)
    np.testing.assert_allclose(outs["window"], outs["scan"], atol=1e-5)


def test_bad_scan_signature_fence(monkeypatch):
    """With a denylisted effective batch, scan requests fall back to the
    python loop with a warning and identical results (docs/SCAN_FAULT.md)."""
    import warnings

    from diffusynth_tpu.diffusion import sampler as sampler_mod

    monkeypatch.setenv("DIFFUSYNTH_BAD_SCAN_BATCHES", "4")
    monkeypatch.setattr(sampler_mod, "_axon_backend", lambda: True)
    shape = (2, H, 24, C)
    cond = jnp.ones((2, 8))
    key = jax.random.key(0)
    s = _sampler("scan", cfg=3.0)   # batch 2 * CFG double = effective 4
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out, _ = s.sample(None, shape, key, condition=cond)
        assert any("known to fault" in str(x.message) for x in w), (
            [str(x.message) for x in w])
    ref, _ = _sampler("python", cfg=3.0).sample(None, shape, key,
                                                condition=cond)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    # Without the env var the scan path is untouched (no warning).
    monkeypatch.delenv("DIFFUSYNTH_BAD_SCAN_BATCHES")
    s2 = _sampler("scan", cfg=3.0)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        s2.sample(None, shape, key, condition=cond)
        assert not any("known to fault" in str(x.message) for x in w)
