"""VQ-GAN adversarial training: alternating D/G updates, EMA codebook.

Reference: model/VQGAN.py:461-763. Per iteration (matching the reference's
order exactly): one generator forward in train mode (EMA codebook update),
discriminator step on (real, fake.detach()), then generator step against the
UPDATED discriminator. Losses: weighted-MAE magnitude + MAE phase
reconstruction, vq commitment, adversarial BCE.

Note the deliberate fix (documented, SURVEY.md section 7): the reference
stacks Sigmoid inside the discriminator AND BCEWithLogitsLoss outside
(VQGAN.py:421,665) - a double sigmoid. Our discriminator emits logits and
the loss is sigmoid-BCE, the standard formulation.
"""

from __future__ import annotations

import functools
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from diffusynth_tpu.configs import VQGANConfig, VQGANTrainConfig
from diffusynth_tpu.nn.vqgan import VQGAN, VQGANDiscriminator
from diffusynth_tpu.parallel.mesh import replicate, shard_batch, shard_stacked_batch
from diffusynth_tpu.train.checkpoints import Checkpointer
from diffusynth_tpu.train.logging import MetricLogger, MetricWindow


def reconstruction_loss(y_pred, y_true, w1=1.0, w2=1.0, epsilon=1e-3):
    """Weighted MAE on the magnitude channel + MAE on phase channels
    (reference: VQGAN.py:461-517). NHWC: channel axis is last."""
    y_true_safe = jnp.maximum(y_true[..., 0], epsilon)
    log_magnitude_loss = w1 * jnp.mean(
        jnp.abs(y_pred[..., 0] - y_true[..., 0]) / y_true_safe
    )
    phase_loss = w2 * jnp.mean(jnp.abs(y_pred[..., 1:] - y_true[..., 1:]))
    return log_magnitude_loss, phase_loss, log_magnitude_loss + phase_loss


def bce_with_logits(logits, labels):
    return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, labels))


def make_vqgan_train_step(
    vqgan: VQGAN,
    disc: VQGANDiscriminator,
    train_config: VQGANTrainConfig,
    g_optimizer: Optional[optax.GradientTransformation] = None,
    d_optimizer: Optional[optax.GradientTransformation] = None,
    steps_per_dispatch: int = 1,
):
    """Returns step(g_vars, d_params, g_opt, d_opt, data) -> (..., metrics).

    g_vars = {"params": ..., "vq": ...}; the EMA codebook updates once per
    iteration in the no-grad forward, exactly like the reference's single
    training-mode forward (VQGAN.py:685).

    steps_per_dispatch=K > 1: data is (K, B, H, W, C) — K alternating D/G
    iterations lax.scan inside ONE jitted dispatch, metrics become (K,)
    vectors. Same rationale as make_diffusion_train_step: per-call
    marshaling of the four donated pytrees dominates wall time on
    dispatch-expensive environments (RESULTS_r2.md config-5).
    """
    cfg = train_config
    g_opt = g_optimizer or optax.adam(cfg.lr)
    d_opt = d_optimizer or optax.adam(cfg.d_lr)

    def init_fn(g_vars, d_params):
        return g_opt.init(g_vars["params"]), d_opt.init(d_params)

    def one_step(g_vars, d_params, g_opt_state, d_opt_state, data):
        # 1) Generator forward in train mode: EMA codebook update + recon
        #    for the discriminator step (no generator grads here).
        (vq_loss_ng, recon_ng, aux), vq_mutated = vqgan.apply(
            g_vars, data, train=True, mutable=("vq",)
        )
        g_vars = {**g_vars, "vq": vq_mutated["vq"]}
        recon_detached = jax.lax.stop_gradient(recon_ng)

        # 2) Discriminator step on (real, fake.detach()).
        def d_loss_fn(dp):
            real_logits = disc.apply(dp, data)
            fake_logits = disc.apply(dp, recon_detached)
            loss_real = bce_with_logits(real_logits, jnp.ones_like(real_logits))
            loss_fake = bce_with_logits(fake_logits, jnp.zeros_like(fake_logits))
            return loss_real + loss_fake

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(d_params)
        d_updates, d_opt_state = d_opt.update(d_grads, d_opt_state, d_params)
        d_params = optax.apply_updates(d_params, d_updates)

        # 3) Generator step against the UPDATED discriminator (fresh forward
        #    in eval mode so the EMA state is not double-updated).
        def g_loss_fn(gp):
            variables = {**g_vars, "params": gp}
            vq_loss, recon, _ = vqgan.apply(variables, data, train=False)
            fake_logits = disc.apply(d_params, recon)
            adver = bce_with_logits(fake_logits, jnp.ones_like(fake_logits))
            lm, ph, rec = reconstruction_loss(
                recon, data, cfg.w1, cfg.w2, cfg.threshold
            )
            total = rec + cfg.vq_weight * vq_loss + cfg.adver_weight * adver
            return total, (lm, ph, vq_loss, adver)

        (g_loss, (lm, ph, vq_loss, adver)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(g_vars["params"])
        g_updates, g_opt_state = g_opt.update(
            g_grads, g_opt_state, g_vars["params"]
        )
        g_vars = {**g_vars,
                  "params": optax.apply_updates(g_vars["params"], g_updates)}

        metrics = {
            "d_loss": d_loss,
            "g_loss": g_loss,
            "log_magnitude_loss": lm,
            "phase_loss": ph,
            "vq_loss": vq_loss,
            "adver_loss": adver,
            "perplexity": aux["perplexity"],
        }
        return g_vars, d_params, g_opt_state, d_opt_state, metrics

    if steps_per_dispatch == 1:
        return init_fn, jax.jit(one_step, donate_argnums=(0, 1, 2, 3))

    K = int(steps_per_dispatch)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def multi_step_fn(g_vars, d_params, g_opt_state, d_opt_state, data):
        assert data.ndim == 5 and data.shape[0] == K, data.shape

        def body(carry, x):
            gv, dp, gs, ds = carry
            gv, dp, gs, ds, metrics = one_step(gv, dp, gs, ds, x)
            return (gv, dp, gs, ds), metrics

        (g_vars, d_params, g_opt_state, d_opt_state), metrics = jax.lax.scan(
            body, (g_vars, d_params, g_opt_state, d_opt_state), data)
        return g_vars, d_params, g_opt_state, d_opt_state, metrics

    return init_fn, multi_step_fn


def train_vqgan(
    model_config: VQGANConfig,
    train_config: VQGANTrainConfig,
    iterator: Iterator,
    init_g_vars: Optional[Dict] = None,
    init_d_params: Optional[Dict] = None,
    checkpointer: Optional[Checkpointer] = None,
    logger: Optional[MetricLogger] = None,
    mesh=None,
    seed: int = 0,
):
    """Training loop (reference: VQGAN.py:589-763). Returns (g_vars,
    d_params)."""
    cfg = train_config
    # Params/optimizers stay float32; cfg.compute_dtype (bfloat16 default)
    # sets the conv compute dtype — the VQ codebook/EMA stats are f32
    # inside the module regardless (nn/vq.py), and the losses reduce in
    # the f32 model outputs' dtype promoted against f32 data.
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        cfg.compute_dtype]
    vqgan = VQGAN(model_config, dtype=dtype)
    disc = VQGANDiscriminator(dtype=dtype)
    logger = logger or MetricLogger(f"runs/{cfg.model_name}_VQVAE")

    data0, _ = next(iterator)
    data0 = jnp.asarray(data0)
    key = jax.random.key(seed)
    k1, k2 = jax.random.split(key)
    g_vars = init_g_vars or jax.jit(vqgan.init)(k1, data0)
    d_params = init_d_params or jax.jit(disc.init)(k2, data0)

    K = max(1, int(getattr(cfg, "steps_per_dispatch", 1)))
    init_fn, step_fn = make_vqgan_train_step(vqgan, disc, cfg,
                                             steps_per_dispatch=K)
    g_opt_state, d_opt_state = init_fn(g_vars, d_params)

    if mesh is not None:
        g_vars = replicate(g_vars, mesh)
        d_params = replicate(d_params, mesh)
        g_opt_state = replicate(g_opt_state, mesh)
        d_opt_state = replicate(d_opt_state, mesh)

    best = float("inf")
    # MetricWindow: metrics stay on device until the window means are
    # needed — float(v) per step would serialize the loop with the
    # dispatch round trip (see train/logging.py).
    history = MetricWindow(cfg.save_steps // K + 1)
    step = 0
    while step < cfg.max_iter:
        if K == 1:
            data, _ = next(iterator)
            data = jnp.asarray(data, jnp.float32)
            if mesh is not None:
                data = shard_batch(np.asarray(data), mesh)
        else:
            data = np.stack([np.asarray(next(iterator)[0], np.float32)
                             for _ in range(K)])
            data = (shard_stacked_batch(data, mesh) if mesh is not None
                    else jnp.asarray(data))
        g_vars, d_params, g_opt_state, d_opt_state, metrics = step_fn(
            g_vars, d_params, g_opt_state, d_opt_state, data
        )
        history.append(metrics)   # scalars (K=1) or (K,) vectors
        step += K
        if step // cfg.save_steps != (step - K) // cfg.save_steps:
            means = history.mean_dict(max(1, cfg.save_steps // K))
            for k, v in means.items():
                logger.log(k, v, step)
            if checkpointer and means["g_loss"] < best:
                best = means["g_loss"]
                checkpointer.save(cfg.model_name, "imageVQVAE",
                                  {"variables": g_vars, "step": step})
                checkpointer.save(cfg.model_name, "imageVQVAE_discriminator",
                                  {"variables": d_params, "step": step})
                checkpointer.save_hyperparameters(
                    cfg.model_name, "VQGAN_STFT",
                    {**model_config.__dict__, **cfg.__dict__,
                     "current_iter": step, **means},
                )
    return g_vars, d_params
