"""Diffusion (U-Net) training: noise-prediction loss, CFG dropout, DP mesh.

Reference: model/diffusion.py:261-302 (conditional_p_losses, huber) and
:379-523 (loop with uncondition_rate dropout, checkpoints every save_steps,
IS eval). The train step is one jitted program with donated buffers; under a
mesh, the batch shards on axis 0 and XLA psums gradients over ICI.
"""

from __future__ import annotations

import functools
import time
from typing import Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from diffusynth_tpu.configs import DiffusionTrainConfig, UNetConfig
from diffusynth_tpu.diffusion.schedule import Schedule
from diffusynth_tpu.nn.unet import ConditionedUnet
from diffusynth_tpu.parallel.mesh import (
    make_mesh, replicate, shard_batch, shard_stacked_batch,
)
from diffusynth_tpu.train.checkpoints import Checkpointer
from diffusynth_tpu.train.logging import MetricLogger, MetricWindow


def _dtype_of(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


def p_losses(unet_apply, params, key, x_start, t, condition, schedule_consts,
             loss_type: str = "huber", noise=None):
    """q_sample -> predict noise -> loss (reference: diffusion.py:261-302).

    noise: optional explicit noise tensor (the reference's
    conditional_p_losses takes the same parameter, diffusion.py:284-285);
    when None it is drawn from `key`. Injection is what lets
    tests/test_train_parity.py pin this loss to the torch reference
    value with shared weights.
    """
    sqrt_ac, sqrt_1mac = schedule_consts
    if noise is None:
        noise = jax.random.normal(key, x_start.shape, dtype=x_start.dtype)
    shape = (-1,) + (1,) * (x_start.ndim - 1)
    x_noisy = (sqrt_ac[t].reshape(shape) * x_start
               + sqrt_1mac[t].reshape(shape) * noise)
    pred = unet_apply(params, x_noisy, t, condition).astype(jnp.float32)
    if loss_type == "l1":
        return jnp.mean(jnp.abs(noise - pred))
    if loss_type == "l2":
        return jnp.mean(jnp.square(noise - pred))
    if loss_type == "huber":
        return jnp.mean(optax.huber_loss(pred, noise, delta=1.0))
    raise NotImplementedError(loss_type)


def ema_of_params(decay: float) -> "optax.GradientTransformation":
    """Optax transform that keeps an EMA copy of the PARAMETERS.

    Beyond-reference feature (the reference trains without weight EMA;
    diffusion.py:379-523): an exponential moving average of the denoiser
    weights is the standard variance-reduction for diffusion sample
    quality. Implemented as a transform chained AFTER the base optimizer —
    at that point `updates` are the final deltas, so the post-step params
    are `apply_updates(params, updates)` and the EMA can live inside
    opt_state. This keeps the jitted step signature, buffer donation, and
    DP replication unchanged. Extract with `get_ema_params(opt_state)`.
    """

    def init(params):
        # Real copies, not jnp.asarray views: the train step donates both
        # params and opt_state, and aliased buffers would be donated twice.
        return {"ema_params": jax.tree_util.tree_map(
            lambda p: jnp.array(p, copy=True), params)}

    def update(updates, state, params=None):
        assert params is not None, "chain ema_of_params after the optimizer"
        new_params = optax.apply_updates(params, updates)
        ema = jax.tree_util.tree_map(
            lambda e, p: decay * e + (1.0 - decay) * p,
            state["ema_params"], new_params)
        return updates, {"ema_params": ema}

    return optax.GradientTransformation(init, update)


def get_ema_params(opt_state):
    """Pull the EMA parameter copy out of an ema_of_params opt state."""
    for leaf_state in jax.tree_util.tree_leaves(
            opt_state, is_leaf=lambda s: isinstance(s, dict)
    ):
        if isinstance(leaf_state, dict) and "ema_params" in leaf_state:
            return leaf_state["ema_params"]
    raise ValueError("opt_state carries no EMA (ema_decay was 0?)")


def make_diffusion_train_step(
    unet: ConditionedUnet,
    timesteps: int = 1000,
    loss_type: str = "huber",
    uncondition_rate: float = 0.1,
    optimizer: Optional[optax.GradientTransformation] = None,
    lr: float = 1e-4,
    ema_decay: float = 0.0,
    steps_per_dispatch: int = 1,
):
    """Returns (init_fn, step_fn).

    step_fn(params, opt_state, key, latents, conditions, uncond) is fully
    jitted with donated params/opt_state; CFG condition dropout happens
    in-step from the PRNG key (reference does it host-side with
    random.random(), diffusion.py:471-476). ema_decay > 0 keeps a weight
    EMA inside opt_state (see ema_of_params); the train loop checkpoints
    it as a sibling "UNet_ema" role.

    steps_per_dispatch=K > 1 returns a step_fn over K STACKED batches —
    latents (K, B, H, W, C), conditions (K, B, D) — that lax.scans the
    single-step body on device and returns losses (K,). One dispatch then
    carries K optimizer steps: dispatching a jitted step whose donated
    params+opt_state pytree has thousands of leaf buffers costs ~0.4 s of
    host/tunnel argument marshaling per call on this environment (device
    time 54 ms at b8 — benchmarks/RESULTS_r2.md config-5), and scanning
    K steps amortizes it K-fold. Semantics identical to K sequential
    step_fn calls modulo the PRNG stream (keys are split per sub-step).
    """
    optimizer = optimizer or optax.adam(lr)
    if ema_decay:
        optimizer = optax.chain(optimizer, ema_of_params(ema_decay))
    sched = Schedule.linear(timesteps)
    consts = (
        jnp.asarray(sched.sqrt_alphas_cumprod, jnp.float32),
        jnp.asarray(sched.sqrt_one_minus_alphas_cumprod, jnp.float32),
    )

    def init_fn(params):
        return optimizer.init(params)

    def one_step(params, opt_state, key, latents, conditions, uncond):
        k_drop, k_t, k_noise = jax.random.split(key, 3)
        B = latents.shape[0]
        drop = jax.random.bernoulli(k_drop, uncondition_rate, (B,))
        conditions = jnp.where(drop[:, None], uncond[None, :], conditions)
        t = jax.random.randint(k_t, (B,), 0, timesteps)

        def loss_fn(p):
            return p_losses(
                lambda pp, x, tt, c: unet.apply(pp, x, tt, c),
                p, k_noise, latents, t, conditions, consts, loss_type,
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if steps_per_dispatch == 1:
        return init_fn, jax.jit(one_step, donate_argnums=(0, 1))

    K = int(steps_per_dispatch)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def multi_step_fn(params, opt_state, key, latents, conditions, uncond):
        assert latents.ndim == 5 and latents.shape[0] == K, latents.shape
        keys = jax.random.split(key, K)

        def body(carry, xs):
            p, s = carry
            k, x, c = xs
            p, s, loss = one_step(p, s, k, x, c, uncond)
            return (p, s), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (keys, latents, conditions))
        return params, opt_state, losses

    return init_fn, multi_step_fn


def restore_diffusion_state(
    unet_config: UNetConfig,
    train_config: DiffusionTrainConfig,
    checkpointer: Checkpointer,
    latent_shape,                 # (H, W, C) — batch-independent template
):
    """Restore (variables, opt_state, step) from the UNet / UNet_opt roles
    for --resume, or None when either role is absent. Templates come from
    jax.eval_shape (no device compute or compile)."""
    cfg = train_config
    name = cfg.model_name
    if not (checkpointer.exists(name, "UNet")
            and checkpointer.exists(name, "UNet_opt")):
        return None
    unet = ConditionedUnet(unet_config, dtype=_dtype_of(cfg.compute_dtype))
    H, W, C = latent_shape
    var_tpl = jax.eval_shape(
        unet.init, jax.random.key(0),
        jax.ShapeDtypeStruct((1, H, W, C), jnp.float32),
        jax.ShapeDtypeStruct((1,), jnp.int32),
        jax.ShapeDtypeStruct((1, unet_config.label_emb_dim), jnp.float32))
    init_fn, _ = make_diffusion_train_step(
        unet, timesteps=cfg.timesteps, loss_type=cfg.loss_type,
        uncondition_rate=cfg.uncondition_rate, lr=cfg.lr,
        ema_decay=cfg.ema_decay,
        steps_per_dispatch=max(1, int(getattr(cfg, "steps_per_dispatch", 1))))
    opt_tpl = jax.eval_shape(init_fn, var_tpl)
    restored = checkpointer.restore(name, "UNet",
                                    {"variables": var_tpl, "step": 0})
    restored_opt = checkpointer.restore(name, "UNet_opt",
                                        {"opt_state": opt_tpl, "step": 0})
    step = int(restored["step"])
    if step != int(restored_opt["step"]):
        # A crash can land between the UNet and UNet_opt saves of one
        # checkpoint event; resuming with mismatched model/optimizer
        # state would silently corrupt training. Refuse and start fresh.
        import warnings

        warnings.warn(
            f"--resume: UNet / UNet_opt checkpoints are from different "
            f"steps ({step} vs {int(restored_opt['step'])}); ignoring "
            f"them and starting fresh", stacklevel=2)
        return None
    return restored["variables"], restored_opt["opt_state"], step


def train_diffusion_model(
    unet_config: UNetConfig,
    train_config: DiffusionTrainConfig,
    iterator: Iterator,
    condition_lookup: Callable,     # attributes -> (B, D) condition array
    unconditional_condition: np.ndarray,
    init_variables: Optional[Dict] = None,
    checkpointer: Optional[Checkpointer] = None,
    logger: Optional[MetricLogger] = None,
    mesh=None,
    eval_fn: Optional[Callable] = None,   # step -> metric (e.g. IS)
    eval_every: int = 20_000,
    seed: int = 0,
    init_opt_state=None,
    start_step: int = 0,
):
    """Training loop (reference: diffusion.py:379-523). Returns (variables,
    opt_state).

    Resume (beyond the reference, whose resume restores model+optimizer
    but replays neither data nor RNG, diffusion.py:443-447): the loop is
    deterministic given (seed, step) — the per-dispatch PRNG key is
    fold_in(key(seed+1), step) and the data stream is positional — so a
    run restored via `init_variables`/`init_opt_state`/`start_step` (with
    the iterator fast-forwarded by `start_step` batches, see
    data_iterator(skip=...)) continues bit-identically to an unkilled
    control. train/run.py --resume wires this up from the UNet/UNet_opt
    checkpoint roles.
    """
    cfg = train_config
    # Params/optimizer stay float32; cfg.compute_dtype (bfloat16 by
    # default) sets the forward/backward compute dtype — the module casts
    # activations, p_losses computes the loss in f32 (TPU-native mixed
    # precision; the reference trains f32 on CUDA, diffusion.py:379-523).
    unet = ConditionedUnet(
        unet_config, dtype=_dtype_of(cfg.compute_dtype))
    logger = logger or MetricLogger(f"runs/{cfg.model_name}_UNet")

    data0, attrs0 = next(iterator)
    cond0 = condition_lookup(attrs0)
    if init_variables is None:
        key = jax.random.key(seed)
        init_variables = jax.jit(unet.init)(
            key, jnp.asarray(data0), jnp.zeros(data0.shape[0], jnp.int32),
            jnp.asarray(cond0),
        )
    K = max(1, int(getattr(cfg, "steps_per_dispatch", 1)))
    init_fn, step_fn = make_diffusion_train_step(
        unet, timesteps=cfg.timesteps, loss_type=cfg.loss_type,
        uncondition_rate=cfg.uncondition_rate, lr=cfg.lr,
        ema_decay=cfg.ema_decay, steps_per_dispatch=K,
    )
    params = init_variables
    opt_state = init_fn(params) if init_opt_state is None else init_opt_state
    uncond = jnp.asarray(unconditional_condition, jnp.float32)

    if mesh is not None:
        params = replicate(params, mesh)
        opt_state = replicate(opt_state, mesh)
        uncond = replicate(uncond, mesh)

    base_key = jax.random.key(seed + 1)
    # MetricWindow: losses stay on device — float(loss) here would block
    # on every step and serialize the loop with the dispatch round trip
    # (the config-5 "wall >> device time" gap; see train/logging.py).
    losses = MetricWindow(max(100, cfg.save_steps) // K + 1)

    def crossed(step: int, every: int) -> bool:
        """Did [step-K, step] cross a multiple of `every`? (log/checkpoint
        cadence is kept in optimizer steps whatever K is)."""
        return step // every != (step - K) // every

    step = int(start_step)
    while step < cfg.max_iter:
        if K == 1:
            data, attrs = next(iterator)
            latents = jnp.asarray(data, jnp.float32)
            cond = jnp.asarray(condition_lookup(attrs), jnp.float32)
            if mesh is not None:
                latents = shard_batch(np.asarray(latents), mesh)
                cond = shard_batch(np.asarray(cond), mesh)
        else:
            datas, conds = [], []
            for _ in range(K):
                data, attrs = next(iterator)
                datas.append(np.asarray(data, np.float32))
                conds.append(np.asarray(condition_lookup(attrs), np.float32))
            latents = np.stack(datas)
            cond = np.stack(conds)
            if mesh is not None:
                latents = shard_stacked_batch(latents, mesh)
                cond = shard_stacked_batch(cond, mesh)
            else:
                latents = jnp.asarray(latents)
                cond = jnp.asarray(cond)
        # Step-indexed key (not a sequential split chain): dispatch i's
        # randomness depends only on (seed, step), so a resumed run
        # replays the identical stream.
        sub = jax.random.fold_in(base_key, step)
        params, opt_state, loss = step_fn(
            params, opt_state, sub, latents, cond, uncond
        )
        losses.append(loss)   # scalar (K=1) or (K,) vector — both fine
        step += K
        if crossed(step, 100):
            logger.log("loss_100", losses.mean(max(1, 100 // K)), step)
        if checkpointer and crossed(step, cfg.save_steps):
            current = losses.mean(max(1, cfg.save_steps // K))
            checkpointer.save(cfg.model_name, "UNet",
                              {"variables": params, "step": step})
            # Optimizer state as a sibling role: what makes --resume a
            # true continuation (the reference saves optimizer_state_dict
            # in the same file, diffusion.py:496-504).
            checkpointer.save(cfg.model_name, "UNet_opt",
                              {"opt_state": opt_state, "step": step})
            if cfg.ema_decay:
                # Separate role (not an extra key in the UNet payload):
                # orbax's structure-matched restore rejects checkpoints
                # with keys absent from the template, so an embedded EMA
                # would make the main checkpoint unloadable by
                # from_pretrained. A sibling "UNet_ema" role keeps both
                # round-trippable with the standard {variables, step}
                # template (from_pretrained(use_ema=True) prefers it).
                checkpointer.save(
                    cfg.model_name, "UNet_ema",
                    {"variables": get_ema_params(opt_state), "step": step})
            checkpointer.save_hyperparameters(
                cfg.model_name, "UNet",
                {**unet_config.__dict__, "BATCH_SIZE": cfg.batch_size,
                 "lr": cfg.lr, "current_iter": step, "current_loss": current},
            )
        if eval_fn and crossed(step, eval_every):
            metric = eval_fn(params, step)
            logger.log("inception_score", float(metric), step)
            if checkpointer:
                checkpointer.save(cfg.model_name, "UNet",
                                  {"variables": params, "step": step},
                                  step=step)
    return params, opt_state
