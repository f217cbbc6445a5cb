"""Multi-modal contrastive training (CLIP-style) over timbre + text features.

Reference: model/multimodal_model.py:171-381. Differences by design:

  * The text backbone (CLAP) stays host-side; batches carry precomputed text
    features. The reference nominally unfreezes CLAP
    (freeze_text_encoder=False, app.py:56) - training a 150M-param torch
    text tower inside a TPU loop is out of scope for capability parity, so
    here the trainable text-side parameters are the projection head (which
    carries the contrastive alignment).
  * Param-group learning rates (head vs timbre tower) map to
    optax.multi_transform over a param-label tree
    (reference: multimodal_model.py:318-332).
  * The reference resamples batches until all label keys are unique
    (multimodal_model.py:197-199) - the loop here does the same via the
    attributes.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Iterator, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from diffusynth_tpu.configs import (
    ContrastiveTrainConfig,
    MultiModalConfig,
    TimbreEncoderConfig,
)
from diffusynth_tpu.dsp.utils import create_key
from diffusynth_tpu.nn.multimodal import MultiModalModel
from diffusynth_tpu.parallel.mesh import replicate, shard_batch, shard_stacked_batch
from diffusynth_tpu.train.checkpoints import Checkpointer
from diffusynth_tpu.train.logging import MetricLogger, MetricWindow


def _param_labels(params):
    """Label tree: 'head' for projection heads, 'timbre' for the tower."""
    flat = flax.traverse_util.flatten_dict(params)
    labels = {}
    for path in flat:
        top = path[1] if path[0] == "params" else path[0]
        labels[path] = "timbre" if str(top).startswith("timbre_encoder") \
            else "head"
    return flax.traverse_util.unflatten_dict(labels)


def make_contrastive_train_step(
    model: MultiModalModel,
    train_config: ContrastiveTrainConfig,
    freeze_timbre: bool = False,
    steps_per_dispatch: int = 1,
):
    """steps_per_dispatch=K > 1: latents/text_features gain a leading (K,)
    axis, K optimizer steps lax.scan inside one dispatch (loss becomes a
    (K,) vector) — see DiffusionTrainConfig.steps_per_dispatch."""
    cfg = train_config
    timbre_tx = (
        optax.set_to_zero() if freeze_timbre
        else optax.adamw(cfg.spectrogram_encoder_lr,
                         weight_decay=cfg.timbre_encoder_weight_decay)
    )
    optimizer = optax.multi_transform(
        {
            "head": optax.adamw(cfg.head_lr,
                                weight_decay=cfg.head_weight_decay),
            "timbre": timbre_tx,
        },
        _param_labels,
    )

    def init_fn(params):
        return optimizer.init(params)

    def one_step(params, opt_state, key, latents, text_features):
        def loss_fn(p):
            return model.apply(p, latents, text_features,
                               deterministic=False, rngs={"dropout": key})

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if steps_per_dispatch == 1:
        return init_fn, jax.jit(one_step, donate_argnums=(0, 1))

    K = int(steps_per_dispatch)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def multi_step_fn(params, opt_state, key, latents, text_features):
        assert latents.shape[0] == K, latents.shape
        keys = jax.random.split(key, K)

        def body(carry, xs):
            p, s = carry
            p, s, loss = one_step(p, s, *xs)
            return (p, s), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (keys, latents, text_features))
        return params, opt_state, losses

    return init_fn, multi_step_fn


def train_multimodal(
    mmm_config: MultiModalConfig,
    timbre_config: TimbreEncoderConfig,
    train_config: ContrastiveTrainConfig,
    iterator: Iterator,
    text_features_lookup: Callable,   # attributes -> (B, Dt) text features
    init_params: Optional[Dict] = None,
    checkpointer: Optional[Checkpointer] = None,
    logger: Optional[MetricLogger] = None,
    mesh=None,
    seed: int = 0,
    max_resample: int = 16,
):
    """Training loop (reference: multimodal_model.py:254-381)."""
    cfg = train_config
    model = MultiModalModel(mmm_config, timbre_config)
    logger = logger or MetricLogger(f"runs/{cfg.model_name}_MMM")

    def next_unique_batch():
        """Reject batches with duplicate label keys (reference:
        multimodal_model.py:197-199)."""
        for _ in range(max_resample):
            data, attrs = next(iterator)
            keys = [create_key(a) for a in attrs]
            if len(set(keys)) == len(keys):
                return data, attrs
        return data, attrs  # give up gracefully on tiny datasets

    data0, attrs0 = next_unique_batch()
    tf0 = text_features_lookup(attrs0)
    params = init_params or jax.jit(model.init)(
        jax.random.key(seed), jnp.asarray(data0), jnp.asarray(tf0)
    )
    K = max(1, int(getattr(cfg, "steps_per_dispatch", 1)))
    init_fn, step_fn = make_contrastive_train_step(
        model, cfg, freeze_timbre=mmm_config.freeze_spectrogram_encoder,
        steps_per_dispatch=K,
    )
    opt_state = init_fn(params)
    if mesh is not None:
        params = replicate(params, mesh)
        opt_state = replicate(opt_state, mesh)

    key = jax.random.key(seed + 1)
    best = float("inf")
    # MetricWindow: no per-step device sync (see train/logging.py).
    losses = MetricWindow(cfg.save_steps // K + 1)
    step = 0
    while step < cfg.max_iter:
        draws = [next_unique_batch() for _ in range(K)]
        latents = np.stack([np.asarray(d, np.float32) for d, _ in draws])
        tf = np.stack([np.asarray(text_features_lookup(a), np.float32)
                       for _, a in draws])
        if K == 1:
            latents, tf = latents[0], tf[0]
        if mesh is not None:
            place = shard_stacked_batch if K > 1 else shard_batch
            latents, tf = place(latents, mesh), place(tf, mesh)
        else:
            latents, tf = jnp.asarray(latents), jnp.asarray(tf)
        key, sub = jax.random.split(key)
        params, opt_state, loss = step_fn(params, opt_state, sub, latents, tf)
        losses.append(loss)
        step += K
        if step // cfg.save_steps != (step - K) // cfg.save_steps:
            current = losses.mean(max(1, cfg.save_steps // K))
            logger.log("train_total_loss", current, step)
            if checkpointer and current < best:
                best = current
                checkpointer.save(cfg.model_name, "MMM",
                                  {"variables": params, "step": step})
                checkpointer.save_hyperparameters(
                    cfg.model_name, "MMM",
                    {**mmm_config.__dict__, **cfg.__dict__,
                     "current_iter": step, "current_loss": current},
                )
    return params, opt_state
