"""Checkpoint round trip: save converted-style variables, reload via
DiffuSynthRuntime.from_pretrained, outputs must match exactly."""

import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np

from diffusynth_tpu.pipelines import DiffuSynthRuntime
from diffusynth_tpu.text import CachedTextEncoder, HashTextEncoder
from diffusynth_tpu.train.checkpoints import Checkpointer
from tests.test_pipelines import tiny_config


def test_from_pretrained_roundtrip(tmp_path):
    cfg = tiny_config()
    enc = CachedTextEncoder(HashTextEncoder(16))
    rt1 = DiffuSynthRuntime(cfg, text_encoder=enc, seed=3)

    models_dir = str(tmp_path / "models_jax")
    ckpt = Checkpointer(models_dir)
    ckpt.save("vqgan", "imageVQVAE",
              {"variables": rt1.vqgan_variables, "step": 7})
    ckpt.save("unet", "UNet", {"variables": rt1.unet_variables, "step": 9})

    rt2 = DiffuSynthRuntime.from_pretrained(
        models_dir, config=cfg, text_encoder=enc, seed=99,  # different seed
    )

    latents = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 16, 8, 4))
        .astype(np.float32))
    _, a1 = rt1.decode_latents(latents)
    _, a2 = rt2.decode_latents(latents)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-6)

    t = jnp.zeros(1, jnp.int32)
    c = jnp.zeros((1, 16))
    o1 = rt1.unet_apply(rt1.unet_variables, latents, t, c)
    o2 = rt2.unet_apply(rt2.unet_variables, latents, t, c)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


def test_from_pretrained_partial_checkpoint(tmp_path):
    """Only the VQGAN checkpoint present: its weights restore, the U-Net
    stays at the template init (mirrors the reference's per-model
    load_pretrain flags, app.py:30-41)."""
    cfg = tiny_config()
    enc = CachedTextEncoder(HashTextEncoder(16))
    rt1 = DiffuSynthRuntime(cfg, text_encoder=enc, seed=3)

    models_dir = str(tmp_path / "models_jax")
    Checkpointer(models_dir).save(
        "vqgan", "imageVQVAE", {"variables": rt1.vqgan_variables, "step": 1})

    rt2 = DiffuSynthRuntime.from_pretrained(
        models_dir, config=cfg, text_encoder=enc, seed=99)

    latents = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 16, 8, 4))
        .astype(np.float32))
    _, a1 = rt1.decode_latents(latents)
    _, a2 = rt2.decode_latents(latents)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-6)

    t = jnp.zeros(1, jnp.int32)
    c = jnp.zeros((1, 16))
    o1 = rt1.unet_apply(rt1.unet_variables, latents, t, c)
    o2 = rt2.unet_apply(rt2.unet_variables, latents, t, c)
    assert float(np.abs(np.asarray(o1) - np.asarray(o2)).max()) > 1e-6


def test_from_pretrained_ema(tmp_path):
    """use_ema=True loads the sibling UNet_ema role (written by training
    with ema_decay>0); use_ema=False — and use_ema=True with no EMA role
    on disk — load the live weights."""
    cfg = tiny_config()
    enc = CachedTextEncoder(HashTextEncoder(16))
    rt1 = DiffuSynthRuntime(cfg, text_encoder=enc, seed=3)

    models_dir = str(tmp_path / "models_jax")
    ckpt = Checkpointer(models_dir)
    ckpt.save("unet", "UNet", {"variables": rt1.unet_variables, "step": 9})

    # use_ema with no EMA checkpoint: silent fallback to live weights.
    rt_fb = DiffuSynthRuntime.from_pretrained(
        models_dir, config=cfg, text_encoder=enc, seed=99, use_ema=True)
    l0 = jax.tree_util.tree_leaves(rt1.unet_variables)[0]
    f0 = jax.tree_util.tree_leaves(rt_fb.unet_variables)[0]
    np.testing.assert_allclose(np.asarray(f0), np.asarray(l0), atol=1e-7)

    ema_vars = jax.tree_util.tree_map(lambda p: p + 1.0, rt1.unet_variables)
    ckpt.save("unet", "UNet_ema", {"variables": ema_vars, "step": 9})

    rt_ema = DiffuSynthRuntime.from_pretrained(
        models_dir, config=cfg, text_encoder=enc, seed=99, use_ema=True)
    rt_live = DiffuSynthRuntime.from_pretrained(
        models_dir, config=cfg, text_encoder=enc, seed=99)
    e0 = jax.tree_util.tree_leaves(rt_ema.unet_variables)[0]
    v0 = jax.tree_util.tree_leaves(rt_live.unet_variables)[0]
    np.testing.assert_allclose(np.asarray(e0), np.asarray(l0) + 1.0,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(l0), atol=1e-7)


def test_from_pretrained_lora(tmp_path):
    """lora_name bakes a saved UNet_lora adapter into the loaded U-Net:
    equals merge_lora(base, adapter) exactly; missing adapter raises."""
    from diffusynth_tpu.train.lora import init_lora, merge_lora

    cfg = tiny_config()
    enc = CachedTextEncoder(HashTextEncoder(16))
    rt1 = DiffuSynthRuntime(cfg, text_encoder=enc, seed=3)

    models_dir = str(tmp_path / "models_jax")
    ckpt = Checkpointer(models_dir)
    ckpt.save("unet", "UNet", {"variables": rt1.unet_variables, "step": 9})

    with pytest.raises(FileNotFoundError):
        DiffuSynthRuntime.from_pretrained(
            models_dir, config=cfg, text_encoder=enc, seed=99,
            lora_name="ft")

    adapter = init_lora(rt1.unet_variables, jax.random.key(5), rank=2)
    adapter = jax.tree_util.tree_map(
        lambda x: x + 0.01 * jnp.ones_like(x), adapter)
    ckpt.save("ft", "UNet_lora", {"variables": adapter, "step": 4})
    ckpt.save_hyperparameters("ft", "UNet_lora",
                              {"rank": 2, "alpha": 8.0, "targets": None})

    rt2 = DiffuSynthRuntime.from_pretrained(
        models_dir, config=cfg, text_encoder=enc, seed=99, lora_name="ft")
    want = merge_lora(rt1.unet_variables, adapter, 8.0)
    w0 = jax.tree_util.tree_leaves(want)
    g0 = jax.tree_util.tree_leaves(rt2.unet_variables)
    for w, g in zip(w0, g0):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-7)
