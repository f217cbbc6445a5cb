"""LoRA fine-tuning for the diffusion U-Net (beyond-reference).

The reference has no parameter-efficient fine-tuning story: adapting the
released model to a new timbre corpus means re-running the full notebook
loop over every U-Net weight (reference colab_notebooks/train_diffusion
.ipynb; model/diffusion.py:379-523). LoRA (Hu et al. 2021) trains only
low-rank factor pairs per weight matrix — here implemented the functional
JAX way rather than by wrapping modules:

- The adapter is a SEPARATE flat pytree ``{path: {"a": (fan_in, r),
  "b": (r, fan_out)}}`` keyed by the flattened path of each adapted
  kernel. The model definition is untouched.
- The merged weights ``W + (alpha/r) * (A @ B).reshape(W.shape)`` are
  materialized *inside* the jitted train step / sampler program, where XLA
  fuses the rank-r matmul + add into the surrounding graph. Base params
  are a frozen, non-donated argument (never closed over — the axon
  remote-compile 413 rule in CLAUDE.md); gradients flow only to the
  factors, so optimizer state is O(r * (fan_in + fan_out)) per site
  instead of O(fan_in * fan_out).
- For inference at zero overhead, :func:`merge_lora` bakes the deltas
  into a standalone params pytree usable by every existing pipeline.

Conv kernels (kh, kw, cin, cout) are factored over (kh*kw*cin, cout) —
the standard LoRA treatment of convolutions. B starts at zero, so step 0
is exactly the base model (pinned by tests/test_lora.py).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from diffusynth_tpu.configs import DiffusionTrainConfig, UNetConfig
from diffusynth_tpu.diffusion.schedule import Schedule
from diffusynth_tpu.nn.unet import ConditionedUnet
from diffusynth_tpu.parallel.mesh import (
    replicate, shard_batch, shard_stacked_batch,
)
from diffusynth_tpu.train.checkpoints import Checkpointer
from diffusynth_tpu.train.diffusion_train import _dtype_of, p_losses
from diffusynth_tpu.train.logging import MetricLogger, MetricWindow


def _path_str(path) -> str:
    """Flatten a tree_util key path to 'a/b/c' (dict keys only here)."""
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:  # pragma: no cover - defensive
            parts.append(str(k))
    return "/".join(parts)


def _fan_shape(kernel_shape) -> tuple:
    """(fan_in, fan_out) of a Dense (in, out) or Conv (kh, kw, cin, cout)
    kernel."""
    *lead, fan_out = kernel_shape
    fan_in = int(np.prod(lead))
    return fan_in, fan_out


def default_target(path: str, leaf) -> bool:
    """Adapt every Dense/Conv kernel big enough to be worth factoring."""
    if not path.endswith("kernel"):
        return False
    if leaf.ndim not in (2, 4):
        return False
    fan_in, fan_out = _fan_shape(leaf.shape)
    return min(fan_in, fan_out) >= 8


def init_lora(
    params,
    key,
    rank: int = 8,
    targets: Optional[Sequence[str]] = None,
) -> Dict[str, Dict[str, jax.Array]]:
    """Build the adapter pytree for ``params``.

    targets: optional substring filters on the flattened path (e.g.
    ``["attn"]`` adapts only attention projections). None adapts every
    kernel passing :func:`default_target`. A is N(0, 1/sqrt(fan_in)),
    B is zero — the adapted model starts exactly at the base model.
    """
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    lora: Dict[str, Dict[str, jax.Array]] = {}
    for path, leaf in flat:
        p = _path_str(path)
        if not default_target(p, leaf):
            continue
        if targets is not None and not any(t in p for t in targets):
            continue
        fan_in, fan_out = _fan_shape(leaf.shape)
        r = min(rank, fan_in, fan_out)
        key, sub = jax.random.split(key)
        lora[p] = {
            "a": (jax.random.normal(sub, (fan_in, r), jnp.float32)
                  / np.sqrt(fan_in)),
            "b": jnp.zeros((r, fan_out), jnp.float32),
        }
    if not lora:
        raise ValueError("no LoRA target kernels matched")
    return lora


def apply_lora(params, lora: Dict[str, Dict[str, jax.Array]],
               alpha: float = 16.0):
    """Return params with ``W + (alpha/r) * A@B`` at every adapted site.

    Pure function of (params, lora) — safe inside jit/grad; XLA fuses the
    rank-r matmuls into the consuming convs' graphs.
    """

    def merge(path, w):
        ab = lora.get(_path_str(path))
        if ab is None:
            return w
        r = ab["a"].shape[-1]
        delta = (ab["a"] @ ab["b"]).reshape(w.shape) * (alpha / r)
        return w + delta.astype(w.dtype)

    return jax.tree_util.tree_map_with_path(merge, params)


@functools.partial(jax.jit, static_argnames=("alpha",))
def merge_lora(params, lora, alpha: float = 16.0):
    """Bake the adapter into a standalone params pytree (zero-overhead
    inference through every existing pipeline / checkpoint path)."""
    return apply_lora(params, lora, alpha)


def lora_num_params(lora) -> int:
    return sum(int(np.prod(x.shape))
               for x in jax.tree_util.tree_leaves(lora))


def make_lora_train_step(
    unet: ConditionedUnet,
    alpha: float = 16.0,
    timesteps: int = 1000,
    loss_type: str = "huber",
    uncondition_rate: float = 0.1,
    optimizer: Optional[optax.GradientTransformation] = None,
    lr: float = 1e-4,
    steps_per_dispatch: int = 1,
):
    """Returns (init_fn, step_fn) for adapter-only training.

    step_fn(base_params, lora, opt_state, key, latents, conditions,
    uncond) -> (lora, opt_state, loss). Only (lora, opt_state) are donated
    — base_params is read-only and stays resident across steps. The loss
    math is the diffusion loss of :func:`p_losses` on the merged weights
    (reference: model/diffusion.py:261-302), so a rank-∞ adapter would
    train identically to full fine-tuning.

    steps_per_dispatch=K scans K optimizer sub-steps over K stacked
    batches per dispatch, same semantics/motivation as
    make_diffusion_train_step (RESULTS_r2.md config-5).
    """
    optimizer = optimizer or optax.adam(lr)
    sched = Schedule.linear(timesteps)
    consts = (
        jnp.asarray(sched.sqrt_alphas_cumprod, jnp.float32),
        jnp.asarray(sched.sqrt_one_minus_alphas_cumprod, jnp.float32),
    )

    def init_fn(lora):
        return optimizer.init(lora)

    def one_step(base_params, lora, opt_state, key, latents, conditions,
                 uncond):
        k_drop, k_t, k_noise = jax.random.split(key, 3)
        B = latents.shape[0]
        drop = jax.random.bernoulli(k_drop, uncondition_rate, (B,))
        conditions = jnp.where(drop[:, None], uncond[None, :], conditions)
        t = jax.random.randint(k_t, (B,), 0, timesteps)

        def loss_fn(l):
            merged = apply_lora(base_params, l, alpha)
            return p_losses(
                lambda pp, x, tt, c: unet.apply(pp, x, tt, c),
                merged, k_noise, latents, t, conditions, consts, loss_type,
            )

        loss, grads = jax.value_and_grad(loss_fn)(lora)
        updates, opt_state = optimizer.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, loss

    if steps_per_dispatch == 1:
        return init_fn, jax.jit(one_step, donate_argnums=(1, 2))

    K = int(steps_per_dispatch)

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def multi_step_fn(base_params, lora, opt_state, key, latents,
                      conditions, uncond):
        assert latents.ndim == 5 and latents.shape[0] == K, latents.shape
        keys = jax.random.split(key, K)

        def body(carry, xs):
            l, s = carry
            k, x, c = xs
            l, s, loss = one_step(base_params, l, s, k, x, c, uncond)
            return (l, s), loss

        (lora, opt_state), losses = jax.lax.scan(
            body, (lora, opt_state), (keys, latents, conditions))
        return lora, opt_state, losses

    return init_fn, multi_step_fn


def train_diffusion_lora(
    unet_config: UNetConfig,
    train_config: DiffusionTrainConfig,
    iterator: Iterator,
    condition_lookup: Callable,
    unconditional_condition: np.ndarray,
    base_variables: Dict,
    rank: int = 8,
    alpha: float = 16.0,
    targets: Optional[Sequence[str]] = None,
    checkpointer: Optional[Checkpointer] = None,
    logger: Optional[MetricLogger] = None,
    mesh=None,
    seed: int = 0,
    eval_fn: Optional[Callable] = None,
    eval_every: int = 200,
):
    """Adapter-only fine-tune loop. Returns (lora, opt_state).

    Mirrors train_diffusion_model's cadence (loss_100 logging, save_steps
    checkpoints) but checkpoints ONLY the adapter, as role "UNet_lora" —
    orders of magnitude smaller than a full U-Net checkpoint. Restore with
    Checkpointer.restore(name, "UNet_lora", {"variables": init_lora(...),
    "step": 0}) and bake with :func:`merge_lora`.

    eval_fn(lora, step) -> float: optional held-out metric (lower =
    better). When given, the "UNet_lora" checkpoint role is BEST-GATED on
    it (the reference's best-loss checkpoint pattern, VQGAN.py:746-757)
    instead of overwritten every save_steps. This matters in practice:
    the in-training loss window only samples PRE-update states, so a
    late-training Adam excursion can leave the final post-update adapter
    far off a good state with no visible sign in the loss curve — both
    r3 demonstration runs ended on such a state (loss window 0.027, final
    adapter's true loss 0.50; benchmarks/RESULTS_r3.md "LoRA
    end-state instability"). Best-gating on a held-out eval of the
    ACTUAL candidate state is the robust fix.
    """
    cfg = train_config
    unet = ConditionedUnet(unet_config, dtype=_dtype_of(cfg.compute_dtype))
    logger = logger or MetricLogger(f"runs/{cfg.model_name}_UNet_lora")
    K = max(1, int(getattr(cfg, "steps_per_dispatch", 1)))
    init_fn, step_fn = make_lora_train_step(
        unet, alpha=alpha, timesteps=cfg.timesteps, loss_type=cfg.loss_type,
        uncondition_rate=cfg.uncondition_rate, lr=cfg.lr,
        steps_per_dispatch=K,
    )
    lora = init_lora(base_variables, jax.random.key(seed), rank, targets)
    opt_state = init_fn(lora)
    base = base_variables
    uncond = jnp.asarray(unconditional_condition, jnp.float32)
    if mesh is not None:
        base = replicate(base, mesh)
        lora = replicate(lora, mesh)
        opt_state = replicate(opt_state, mesh)
        uncond = replicate(uncond, mesh)

    key = jax.random.key(seed + 1)
    losses = MetricWindow(max(100, cfg.save_steps) // K + 1)
    best_metric = float("inf")

    def crossed(step: int, every: int) -> bool:
        return step // every != (step - K) // every

    step = 0
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
                conds.append(np.asarray(condition_lookup(attrs),
                                        np.float32))
            latents, cond = np.stack(datas), np.stack(conds)
            if mesh is not None:
                latents = shard_stacked_batch(latents, mesh)
                cond = shard_stacked_batch(cond, mesh)
            else:
                latents, cond = jnp.asarray(latents), jnp.asarray(cond)
        key, sub = jax.random.split(key)
        lora, opt_state, loss = step_fn(
            base, lora, opt_state, sub, latents, cond, uncond)
        losses.append(loss)
        step += K
        if crossed(step, 100):
            logger.log("loss_100", losses.mean(max(1, 100 // K)), step)
        # Best-gating: with eval_fn set, EVERY save is gated on an actual
        # evaluated improvement at this step — a save_steps crossing that is
        # not an eval crossing must not overwrite the best-gated checkpoint
        # with an unevaluated (possibly worse) adapter state.
        improved = eval_fn is None
        final = step >= cfg.max_iter
        if eval_fn is not None and (crossed(step, eval_every) or final):
            metric = float(eval_fn(lora, step))
            logger.log("eval_loss", metric, step)
            improved = metric < best_metric
            if improved:
                best_metric = metric
        if checkpointer and improved and (
                crossed(step, cfg.save_steps)
                or (eval_fn is not None
                    and (crossed(step, eval_every) or final))):
            checkpointer.save(cfg.model_name, "UNet_lora",
                              {"variables": lora, "step": step})
            checkpointer.save_hyperparameters(
                cfg.model_name, "UNet_lora",
                {"rank": rank, "alpha": alpha,
                 "targets": list(targets) if targets else None,
                 "BATCH_SIZE": cfg.batch_size, "lr": cfg.lr,
                 "current_iter": step,
                 "eval_loss": best_metric if eval_fn else None})
    return lora, opt_state
