"""Inception Score over generated timbres, using the timbre encoder's
instrument classifier as the "inception" network.

The reference imports a metrics.IS module that is missing from its repo
(reference: model/diffusion.py:12,509-510; SURVEY.md section 1); this is the
standard IS formulation exp(E_x KL(p(y|x) || p(y))) over the instrument
posterior, evaluated on freshly sampled latents.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def inception_score(log_probs: jnp.ndarray, splits: int = 1) -> float:
    """IS from per-sample class log-probabilities (N, K)."""
    log_probs = np.asarray(log_probs, dtype=np.float64)
    probs = np.exp(log_probs)
    scores = []
    n = len(probs)
    for part in np.array_split(probs, splits):
        marginal = part.mean(axis=0, keepdims=True)
        kl = (part * (np.log(part + 1e-16) - np.log(marginal + 1e-16))).sum(1)
        scores.append(np.exp(kl.mean()))
    return float(np.mean(scores))


def get_inception_score(
    sampler,                      # DiffSynthSampler (already respaced)
    timbre_apply: Callable,       # latents -> (feature, inst_logp, ...)
    unet_variables=None,          # threaded to the sampler's unet_apply
    n_batches: int = 50,
    batch_size: int = 8,
    width: int = 64,
    condition: Optional[jnp.ndarray] = None,
    seed: int = 0,
) -> float:
    """Sample latents and score them (reference call site:
    diffusion.py:507-514 with positive_prompts="", CFG=1, 20 steps)."""
    height = sampler.height
    channels = sampler.channels
    all_logp = []
    key = jax.random.key(seed)
    for b in range(n_batches):
        key, sub = jax.random.split(key)
        cond = None
        if condition is not None:
            cond = jnp.broadcast_to(
                jnp.asarray(condition).reshape(1, -1),
                (batch_size, np.asarray(condition).size),
            )
        latents, _ = sampler.sample(
            unet_variables, (batch_size, height, width, channels), sub,
            condition=cond,
        )
        _, inst_logp, *_ = timbre_apply(latents)
        all_logp.append(np.asarray(inst_logp))
    return inception_score(np.concatenate(all_logp, axis=0))
