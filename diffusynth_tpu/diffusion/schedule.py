"""Diffusion beta schedules, derived constants, and respacing.

Host-side numpy (float64) precompute mirroring reference:
model/DiffSynthSampler.py:169-222 and model/diffusion_components.py:297-327.
The arrays become XLA constants when a sampler jits, so gathers inside the
scan are cheap.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class Schedule:
    """All precomputed diffusion constants for a (possibly respaced) chain."""

    betas: np.ndarray
    timestep_map: np.ndarray        # respaced index -> original timestep
    respaced: bool = False

    # Derived (filled by __post_init__).
    alphas: np.ndarray = field(init=False)
    alphas_cumprod: np.ndarray = field(init=False)
    alphas_cumprod_prev: np.ndarray = field(init=False)
    alphas_cumprod_next: np.ndarray = field(init=False)
    sqrt_alphas_cumprod: np.ndarray = field(init=False)
    sqrt_one_minus_alphas_cumprod: np.ndarray = field(init=False)
    log_one_minus_alphas_cumprod: np.ndarray = field(init=False)
    sqrt_recip_alphas_cumprod: np.ndarray = field(init=False)
    sqrt_recip_alphas: np.ndarray = field(init=False)
    sqrt_recipm1_alphas_cumprod: np.ndarray = field(init=False)
    posterior_variance: np.ndarray = field(init=False)

    def __post_init__(self):
        betas = np.asarray(self.betas, dtype=np.float64)
        object.__setattr__(self, "betas", betas)
        alphas = 1.0 - betas
        ac = np.cumprod(alphas, axis=0)
        set_ = object.__setattr__
        set_(self, "alphas", alphas)
        set_(self, "alphas_cumprod", ac)
        set_(self, "alphas_cumprod_prev", np.append(1.0, ac[:-1]))
        set_(self, "alphas_cumprod_next", np.append(ac[1:], 0.0))
        set_(self, "sqrt_alphas_cumprod", np.sqrt(ac))
        set_(self, "sqrt_one_minus_alphas_cumprod", np.sqrt(1.0 - ac))
        set_(self, "log_one_minus_alphas_cumprod", np.log(1.0 - ac))
        set_(self, "sqrt_recip_alphas_cumprod", np.sqrt(1.0 / ac))
        set_(self, "sqrt_recip_alphas", np.sqrt(1.0 / alphas))
        set_(self, "sqrt_recipm1_alphas_cumprod", np.sqrt(1.0 / ac - 1.0))
        set_(self, "posterior_variance",
             betas * (1.0 - np.append(1.0, ac[:-1])) / (1.0 - ac))

    @classmethod
    def linear(cls, timesteps: int, beta_start: float = 1e-4,
               beta_end: float = 0.02) -> "Schedule":
        """Linear beta schedule (reference: diffusion_components.py:297-303)."""
        betas = np.linspace(beta_start, beta_end, timesteps, dtype=np.float64)
        return cls(betas=betas, timestep_map=np.arange(timesteps))

    @property
    def num_timesteps(self) -> int:
        return len(self.betas)

    def respace(self, use_timesteps: Sequence[int]) -> "Schedule":
        """Keep only `use_timesteps`, rebuilding betas so the kept
        alphas_cumprod are exact (reference: DiffSynthSampler.py:204-222)."""
        assert not self.respaced, "schedule already respaced"
        use = set(int(t) for t in use_timesteps)
        last_ac = 1.0
        new_betas: List[float] = []
        tmap: List[int] = []
        for i, ac in enumerate(self.alphas_cumprod):
            if i in use:
                new_betas.append(1.0 - ac / last_ac)
                last_ac = ac
                tmap.append(i)
        return Schedule(
            betas=np.asarray(new_betas),
            timestep_map=np.asarray(tmap),
            respaced=True,
        )


def respaced_timesteps(timesteps: int, steps: int) -> np.ndarray:
    """Evenly spaced subset of [0, timesteps), the reference's respacing
    grid (reference: text2sound.py:106)."""
    return np.linspace(0, timesteps - 1, steps, dtype=np.int64)


def q_sample(x_start: jnp.ndarray, t: jnp.ndarray, schedule: Schedule,
             noise: jnp.ndarray) -> jnp.ndarray:
    """Forward diffusion q(x_t | x_0) (reference: DiffSynthSampler.py:271-294).

    t: (B,) int indices into the (possibly respaced) schedule.
    """
    sac = jnp.asarray(schedule.sqrt_alphas_cumprod, dtype=x_start.dtype)
    somac = jnp.asarray(schedule.sqrt_one_minus_alphas_cumprod, dtype=x_start.dtype)
    shape = (-1,) + (1,) * (x_start.ndim - 1)
    return sac[t].reshape(shape) * x_start + somac[t].reshape(shape) * noise
