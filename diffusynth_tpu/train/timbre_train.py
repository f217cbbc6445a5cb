"""Timbre encoder training: 4-task classification over latents.

Reference: model/timbre_encoder_pretrain.py:201-341 (NLL x3 + BCE, Adam,
best-loss checkpointing every 500 steps).
"""

from __future__ import annotations

import functools
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from diffusynth_tpu.configs import TimbreEncoderConfig, TimbreTrainConfig
from diffusynth_tpu.nn.timbre import TimbreEncoder
from diffusynth_tpu.parallel.mesh import replicate, shard_batch, shard_stacked_batch
from diffusynth_tpu.train.checkpoints import Checkpointer
from diffusynth_tpu.train.logging import MetricLogger, MetricWindow


def _nll(log_probs, labels):
    return -jnp.mean(jnp.take_along_axis(
        log_probs, labels[:, None], axis=1))


def _bce(probs, targets):
    eps = 1e-7
    p = jnp.clip(probs, eps, 1 - eps)
    return -jnp.mean(targets * jnp.log(p) + (1 - targets) * jnp.log(1 - p))


def make_timbre_train_step(
    model: TimbreEncoder,
    optimizer: Optional[optax.GradientTransformation] = None,
    lr: float = 1e-3,
    steps_per_dispatch: int = 1,
):
    """steps_per_dispatch=K > 1: all array args gain a leading (K,) axis
    and K optimizer steps lax.scan inside one dispatch (loss/accs become
    (K,) vectors) — see DiffusionTrainConfig.steps_per_dispatch."""
    optimizer = optimizer or optax.adam(lr)

    def init_fn(params):
        return optimizer.init(params)

    def one_step(params, opt_state, latents, instrument, family, velocity,
                 qualities):
        def loss_fn(p):
            _, inst_lp, fam_lp, vel_lp, qual_p = model.apply(p, latents)
            loss = (_nll(inst_lp, instrument) + _nll(fam_lp, family)
                    + _nll(vel_lp, velocity) + _bce(qual_p, qualities))
            accs = {
                "instrument_acc": jnp.mean(
                    (jnp.argmax(inst_lp, -1) == instrument) * 100.0),
                "family_acc": jnp.mean(
                    (jnp.argmax(fam_lp, -1) == family) * 100.0),
                "velocity_acc": jnp.mean(
                    (jnp.argmax(vel_lp, -1) == velocity) * 100.0),
                "qualities_acc": jnp.mean(
                    ((qual_p > 0.5) == qualities) * 100.0),
            }
            return loss, accs

        (loss, accs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, accs

    if steps_per_dispatch == 1:
        return init_fn, jax.jit(one_step, donate_argnums=(0, 1))

    K = int(steps_per_dispatch)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def multi_step_fn(params, opt_state, latents, instrument, family,
                      velocity, qualities):
        assert latents.shape[0] == K, latents.shape

        def body(carry, xs):
            p, s = carry
            p, s, loss, accs = one_step(p, s, *xs)
            return (p, s), (loss, accs)

        (params, opt_state), (losses, accs) = jax.lax.scan(
            body, (params, opt_state),
            (latents, instrument, family, velocity, qualities))
        return params, opt_state, losses, accs

    return init_fn, multi_step_fn


def batch_labels(attributes):
    """attributes dicts -> label arrays (reference extracts them per batch,
    timbre_encoder_pretrain.py:271-274)."""
    instrument = np.asarray([a["instrument"] for a in attributes], np.int32)
    family = np.asarray([a["instrument_family"] for a in attributes], np.int32)
    velocity = np.asarray([a["velocity"] for a in attributes], np.int32)
    qualities = np.asarray([a["qualities"] for a in attributes], np.float32)
    return instrument, family, velocity, qualities


def train_timbre_encoder(
    model_config: TimbreEncoderConfig,
    train_config: TimbreTrainConfig,
    iterator: Iterator,
    init_params: Optional[Dict] = None,
    checkpointer: Optional[Checkpointer] = None,
    logger: Optional[MetricLogger] = None,
    mesh=None,
    seed: int = 0,
):
    """Training loop (reference: timbre_encoder_pretrain.py:201-341)."""
    cfg = train_config
    model = TimbreEncoder(model_config)
    logger = logger or MetricLogger(f"runs/{cfg.model_name}_timbre_encoder")

    data0, _ = next(iterator)
    params = init_params or jax.jit(model.init)(jax.random.key(seed),
                                                jnp.asarray(data0))
    K = max(1, int(getattr(cfg, "steps_per_dispatch", 1)))
    init_fn, step_fn = make_timbre_train_step(model, lr=cfg.lr,
                                              steps_per_dispatch=K)
    opt_state = init_fn(params)
    if mesh is not None:
        params = replicate(params, mesh)
        opt_state = replicate(opt_state, mesh)

    best = float("inf")
    # MetricWindow: no per-step device sync (see train/logging.py).
    losses = MetricWindow(cfg.save_steps // K + 1)
    acc_hist = MetricWindow(cfg.save_steps // K + 1)
    place = shard_stacked_batch if (mesh is not None and K > 1) else (
        (lambda x, m: shard_batch(x, m)) if mesh is not None
        else (lambda x, m: jnp.asarray(x)))
    step = 0
    while step < cfg.max_iter:
        draws = [next(iterator) for _ in range(K)]
        labels = [batch_labels(attrs) for _, attrs in draws]
        parts = [np.stack([np.asarray(d, np.float32) for d, _ in draws])] + [
            np.stack([lab[j] for lab in labels]) for j in range(4)]
        if K == 1:
            parts = [p[0] for p in parts]
        latents, inst, fam, vel, qual = (place(p, mesh) for p in parts)
        params, opt_state, loss, accs = step_fn(
            params, opt_state, latents, inst, fam, vel, qual,
        )
        losses.append(loss)
        acc_hist.append(accs)
        step += K
        if step // cfg.save_steps != (step - K) // cfg.save_steps:
            current = losses.mean(max(1, cfg.save_steps // K))
            logger.log("train_loss", current, step)
            for k, v in acc_hist.mean_dict(
                    max(1, cfg.save_steps // K)).items():
                logger.log(k, v, step)
            if checkpointer and current < best:
                best = current
                checkpointer.save(cfg.model_name, "timbre_encoder",
                                  {"variables": params, "step": step})
                checkpointer.save_hyperparameters(
                    cfg.model_name, "timbre_encoder",
                    {**model_config.__dict__, "BATCH_SIZE": cfg.batch_size,
                     "lr": cfg.lr, "current_iter": step,
                     "current_loss": current},
                )
    return params, opt_state
