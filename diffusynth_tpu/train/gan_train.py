"""One-shot cGAN training (ConditionedUnet generator + conv discriminator).

Reference: model/GAN.py:183-350. The generator maps noise -> latent in a
single pass (no diffusion chain); standard alternating BCE updates.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from diffusynth_tpu.configs import GANTrainConfig, UNetConfig
from diffusynth_tpu.nn.gan import GANDiscriminator
from diffusynth_tpu.nn.unet import ConditionedUnet
from diffusynth_tpu.parallel.mesh import replicate, shard_batch, shard_stacked_batch
from diffusynth_tpu.train.checkpoints import Checkpointer
from diffusynth_tpu.train.logging import MetricLogger, MetricWindow
from diffusynth_tpu.train.vqgan_train import bce_with_logits


def make_gan_train_steps(
    generator: ConditionedUnet,
    disc: GANDiscriminator,
    train_config: GANTrainConfig,
    steps_per_dispatch: int = 1,
):
    """Returns (init_fn, step_fn). The generator consumes (noise, t=0,
    condition) - the reference calls the U-Net with a zero timestep
    equivalent single pass (GAN.py:114 generator(noise)).

    steps_per_dispatch=K > 1: real/conditions gain a leading (K,) axis, K
    alternating D/G iterations lax.scan inside one dispatch (metrics
    become (K,) vectors) — see DiffusionTrainConfig.steps_per_dispatch."""
    cfg = train_config
    g_opt = optax.adam(cfg.g_lr)
    d_opt = optax.adam(cfg.d_lr)

    def init_fn(g_params, d_params):
        return g_opt.init(g_params), d_opt.init(d_params)

    def one_step(g_params, d_params, g_opt_state, d_opt_state, key, real,
                 conditions):
        B = real.shape[0]
        t0 = jnp.zeros((B,), jnp.int32)
        noise = jax.random.normal(key, real.shape)

        # Discriminator step.
        def d_loss_fn(dp):
            fake = generator.apply(g_params, noise, t0, conditions)
            fake = jax.lax.stop_gradient(fake)
            real_logits = disc.apply(dp, real, conditions)
            fake_logits = disc.apply(dp, fake, conditions)
            return (bce_with_logits(real_logits, jnp.ones_like(real_logits))
                    + bce_with_logits(fake_logits, jnp.zeros_like(fake_logits)))

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(d_params)
        d_updates, d_opt_state = d_opt.update(d_grads, d_opt_state, d_params)
        d_params = optax.apply_updates(d_params, d_updates)

        # Generator step against the updated discriminator.
        def g_loss_fn(gp):
            fake = generator.apply(gp, noise, t0, conditions)
            fake_logits = disc.apply(d_params, fake, conditions)
            return bce_with_logits(fake_logits, jnp.ones_like(fake_logits))

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(g_params)
        g_updates, g_opt_state = g_opt.update(g_grads, g_opt_state, g_params)
        g_params = optax.apply_updates(g_params, g_updates)

        return (g_params, d_params, g_opt_state, d_opt_state,
                {"d_loss": d_loss, "g_loss": g_loss})

    if steps_per_dispatch == 1:
        return init_fn, jax.jit(one_step, donate_argnums=(0, 1, 2, 3))

    K = int(steps_per_dispatch)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def multi_step_fn(g_params, d_params, g_opt_state, d_opt_state, key,
                      real, conditions):
        assert real.shape[0] == K, real.shape
        keys = jax.random.split(key, K)

        def body(carry, xs):
            gp, dp, gs, ds = carry
            gp, dp, gs, ds, metrics = one_step(gp, dp, gs, ds, *xs)
            return (gp, dp, gs, ds), metrics

        (g_params, d_params, g_opt_state, d_opt_state), metrics = \
            jax.lax.scan(body, (g_params, d_params, g_opt_state,
                                d_opt_state), (keys, real, conditions))
        return g_params, d_params, g_opt_state, d_opt_state, metrics

    return init_fn, multi_step_fn


def train_gan(
    unet_config: UNetConfig,
    train_config: GANTrainConfig,
    iterator: Iterator,
    condition_lookup: Callable,
    checkpointer: Optional[Checkpointer] = None,
    logger: Optional[MetricLogger] = None,
    mesh=None,
    seed: int = 0,
):
    """Training loop (reference: GAN.py:183-350)."""
    cfg = train_config
    # float32 params, cfg.compute_dtype forward/backward (see
    # VQGANTrainConfig.compute_dtype).
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        cfg.compute_dtype]
    generator = ConditionedUnet(unet_config, dtype=dtype)
    disc = GANDiscriminator(label_emb_dim=unet_config.label_emb_dim,
                            dtype=dtype)
    logger = logger or MetricLogger(f"runs/{cfg.model_name}_GAN")

    data0, attrs0 = next(iterator)
    cond0 = jnp.asarray(condition_lookup(attrs0))
    data0 = jnp.asarray(data0)
    key = jax.random.key(seed)
    k1, k2, key = jax.random.split(key, 3)
    g_params = jax.jit(generator.init)(
        k1, data0, jnp.zeros(data0.shape[0], jnp.int32), cond0
    )
    d_params = jax.jit(disc.init)(k2, data0, cond0)
    K = max(1, int(getattr(cfg, "steps_per_dispatch", 1)))
    init_fn, step_fn = make_gan_train_steps(generator, disc, cfg,
                                            steps_per_dispatch=K)
    g_opt_state, d_opt_state = init_fn(g_params, d_params)
    if mesh is not None:
        g_params, d_params = replicate(g_params, mesh), replicate(d_params, mesh)
        g_opt_state = replicate(g_opt_state, mesh)
        d_opt_state = replicate(d_opt_state, mesh)

    # MetricWindow: no per-step device sync (see train/logging.py).
    hist = MetricWindow(cfg.save_steps // K + 1)
    step = 0
    while step < cfg.max_iter:
        draws = [next(iterator) for _ in range(K)]
        real = np.stack([np.asarray(d, np.float32) for d, _ in draws])
        cond = np.stack([np.asarray(condition_lookup(a), np.float32)
                         for _, a in draws])
        if K == 1:
            real, cond = real[0], cond[0]
        if mesh is not None:
            place = shard_stacked_batch if K > 1 else shard_batch
            real, cond = place(real, mesh), place(cond, mesh)
        else:
            real, cond = jnp.asarray(real), jnp.asarray(cond)
        key, sub = jax.random.split(key)
        g_params, d_params, g_opt_state, d_opt_state, metrics = step_fn(
            g_params, d_params, g_opt_state, d_opt_state, sub, real, cond
        )
        hist.append(metrics)
        step += K
        if step // cfg.save_steps != (step - K) // cfg.save_steps:
            means = hist.mean_dict(max(1, cfg.save_steps // K))
            for k, v in means.items():
                logger.log(k, v, step)
            if checkpointer:
                checkpointer.save(cfg.model_name, "generator",
                                  {"variables": g_params, "step": step})
                checkpointer.save(cfg.model_name, "discriminator",
                                  {"variables": d_params, "step": step})
                checkpointer.save_hyperparameters(
                    cfg.model_name, "GAN",
                    {**cfg.__dict__, "current_iter": step, **means},
                )
    return g_params, d_params
