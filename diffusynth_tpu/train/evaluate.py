"""Evaluation loops: average losses/accuracies over n batches.

Mirrors the reference's in-training evaluation family (evaluate_VQGAN
VQGAN.py:520-561, evaluate_diffusion_model diffusion.py:305-351,
evaluate_timbre_encoder timbre_encoder_pretrain.py:155-198, valid_epoch
multimodal_model.py:220-251, evaluate_GAN GAN.py:72-130) with jitted eval
steps.
"""

from __future__ import annotations

from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from diffusynth_tpu.train.diffusion_train import p_losses
from diffusynth_tpu.train.timbre_train import batch_labels, _bce, _nll
from diffusynth_tpu.train.vqgan_train import bce_with_logits, reconstruction_loss


def evaluate_diffusion(unet, params, iterator, condition_lookup,
                       timesteps: int = 1000, n_batches: int = 100,
                       loss_type: str = "huber", seed: int = 0) -> float:
    """Average noise-prediction loss (reference: diffusion.py:305-351)."""
    from diffusynth_tpu.diffusion.schedule import Schedule

    sched = Schedule.linear(timesteps)
    consts = (
        jnp.asarray(sched.sqrt_alphas_cumprod, jnp.float32),
        jnp.asarray(sched.sqrt_one_minus_alphas_cumprod, jnp.float32),
    )

    @jax.jit
    def eval_step(params, key, latents, cond):
        k_t, k_n = jax.random.split(key)
        t = jax.random.randint(k_t, (latents.shape[0],), 0, timesteps)
        return p_losses(lambda p, x, tt, c: unet.apply(p, x, tt, c),
                        params, k_n, latents, t, cond, consts, loss_type)

    key = jax.random.key(seed)
    losses = []
    for _ in range(n_batches):
        data, attrs = next(iterator)
        cond = jnp.asarray(condition_lookup(attrs), jnp.float32)
        key, sub = jax.random.split(key)
        losses.append(float(eval_step(params, sub,
                                      jnp.asarray(data, jnp.float32), cond)))
    return float(np.mean(losses))


def evaluate_vqgan(vqgan, disc, g_vars, d_params, iterator, train_config,
                   n_batches: int = 100) -> float:
    """Average combined VQGAN loss (reference: VQGAN.py:520-561)."""
    cfg = train_config

    @jax.jit
    def eval_step(g_vars, d_params, data):
        vq_loss, recon, _ = vqgan.apply(g_vars, data, train=False)
        fake_logits = disc.apply(d_params, recon)
        adver = bce_with_logits(fake_logits, jnp.ones_like(fake_logits))
        _, _, rec = reconstruction_loss(recon, data, cfg.w1, cfg.w2,
                                        cfg.threshold)
        return rec + cfg.vq_weight * vq_loss + cfg.adver_weight * adver

    losses = []
    for _ in range(n_batches):
        data, _ = next(iterator)
        losses.append(float(eval_step(g_vars, d_params,
                                      jnp.asarray(data, jnp.float32))))
    return float(np.mean(losses))


def evaluate_timbre(model, params, iterator, n_batches: int = 100) -> float:
    """Average multi-task loss (reference: timbre_encoder_pretrain.py:155-198)."""

    @jax.jit
    def eval_step(params, latents, inst, fam, vel, qual):
        _, inst_lp, fam_lp, vel_lp, qual_p = model.apply(params, latents)
        return (_nll(inst_lp, inst) + _nll(fam_lp, fam)
                + _nll(vel_lp, vel) + _bce(qual_p, qual))

    losses = []
    for _ in range(n_batches):
        data, attrs = next(iterator)
        inst, fam, vel, qual = batch_labels(attrs)
        losses.append(float(eval_step(
            params, jnp.asarray(data, jnp.float32), jnp.asarray(inst),
            jnp.asarray(fam), jnp.asarray(vel), jnp.asarray(qual))))
    return float(np.mean(losses))


def evaluate_contrastive(model, params, iterator, text_features_lookup,
                         n_batches: int = 10) -> float:
    """Average contrastive loss (reference: multimodal_model.py:220-251)."""

    @jax.jit
    def eval_step(params, latents, text_feats):
        return model.apply(params, latents, text_feats, deterministic=True)

    losses = []
    for _ in range(n_batches):
        data, attrs = next(iterator)
        tf = jnp.asarray(text_features_lookup(attrs), jnp.float32)
        losses.append(float(eval_step(params,
                                      jnp.asarray(data, jnp.float32), tf)))
    return float(np.mean(losses))


def evaluate_gan(generator, disc, g_params, d_params, iterator,
                 condition_lookup, n_batches: int = 100, seed: int = 0):
    """Discriminator real/fake accuracy (reference: GAN.py:72-130)."""

    @jax.jit
    def eval_step(g_params, d_params, key, real, cond):
        noise = jax.random.normal(key, real.shape)
        t0 = jnp.zeros((real.shape[0],), jnp.int32)
        fake = generator.apply(g_params, noise, t0, cond)
        real_acc = jnp.mean((disc.apply(d_params, real, cond) > 0.0) * 1.0)
        fake_acc = jnp.mean((disc.apply(d_params, fake, cond) < 0.0) * 1.0)
        return real_acc, fake_acc

    key = jax.random.key(seed)
    real_accs, fake_accs = [], []
    for _ in range(n_batches):
        data, attrs = next(iterator)
        cond = jnp.asarray(condition_lookup(attrs), jnp.float32)
        key, sub = jax.random.split(key)
        ra, fa = eval_step(g_params, d_params, sub,
                           jnp.asarray(data, jnp.float32), cond)
        real_accs.append(float(ra))
        fake_accs.append(float(fa))
    return float(np.mean(real_accs)), float(np.mean(fake_accs))
