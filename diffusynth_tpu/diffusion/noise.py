"""Deterministic noise strategies for variable-width latents.

The reference builds variable-width noise by slicing/concatenating a
train-width (64) noise template with a preserved release tail
(reference: DiffSynthSampler.py:97-167). Here the same structure is a
host-precomputed GATHER INDEX MAP into the template's width axis - the
device does one gather, shapes stay static, and any noise tensor (initial
noise, per-step DDPM noise) gets the repeat structure for free.

Layout: NHWC latents (B, H, W, C); the width axis is 2.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def repeat_indices(width: int, train_width: int = 64) -> Tuple[np.ndarray, List[int]]:
    """Index map (width,) into [0, train_width) + concat points.

    Port of the reference's repeat strategy (DiffSynthSampler.py:97-167):
      * release tail = last train_width/4 columns, always preserved at the end
      * width <= train_width: head columns + tail-of-first-part columns
      * width  > train_width: repeated halves of the first part + a centered
        middle remainder
    concat_points mark segment starts (consumed by dynamic masks).
    """
    release = train_width // 4
    first = train_width - release
    head_of = np.arange(first)
    release_of = np.arange(train_width - release, train_width)

    parts: List[np.ndarray] = []
    if width <= train_width:
        head_w = (width - release) // 2
        tail_w = width - release - head_w
        parts = [head_of[:head_w], head_of[first - tail_w:], release_of]
    else:
        repeats = (width - release) // first
        extra = (width - release) % first
        rep_head_w = first // 2
        rep_tail_w = first - rep_head_w
        mid_start = (first - extra) // 2
        parts = (
            [head_of[:rep_head_w]] * repeats
            + [head_of[mid_start:mid_start + extra]]
            + [head_of[first - rep_tail_w:]] * repeats
            + [release_of]
        )

    concat_points = [0]
    for p in parts[:-1]:
        concat_points.append(concat_points[-1] + len(p))
    indices = np.concatenate(parts)
    assert indices.shape == (width,), (indices.shape, width)
    return indices, concat_points


def build_noise(
    key: jax.Array,
    batch: int,
    height: int,
    width: int,
    channels: int,
    train_width: int = 64,
    max_width: int = 256,
    strategy: str = "repeat",
    template: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Optional[List[int]]]:
    """Deterministic noise (B, H, W, C) + concat points.

    `template` optionally supplies the base noise (B, H, train_width, C) for
    the repeat strategy or (B, H, max_width, C) otherwise - the reference's
    `reference_noise` argument.
    """
    if strategy == "repeat":
        if template is None:
            template = jax.random.normal(
                key, (batch, height, train_width, channels), dtype=jnp.float32
            )
        idx, concat_points = repeat_indices(width, train_width)
        return template[:, :, jnp.asarray(idx), :], concat_points
    else:
        if template is None:
            template = jax.random.normal(
                key, (batch, height, max_width, channels), dtype=jnp.float32
            )
        return template[:, :, :width, :], None


def linear_interpolation_noise(
    key: jax.Array,
    shape: Tuple[int, int, int, int],
    variance: float = 1.0,
    first_endpoint: Optional[jnp.ndarray] = None,
    second_endpoint: Optional[jnp.ndarray] = None,
    train_width: int = 64,
) -> jnp.ndarray:
    """Noise batch interpolating between two endpoints
    (reference: DiffSynthSampler.py:224-269).

    With both endpoints: exact linear interpolation across the batch. With
    at most one: a linear recurrence through deterministic noise points,
    variance-normalized, optionally pinned to the first endpoint.
    """
    B, H, W, C = shape
    if first_endpoint is not None and second_endpoint is not None:
        alphas = jnp.linspace(0.0, 1.0, B).reshape(B, 1, 1, 1)
        return (1.0 - alphas) * first_endpoint[None] + alphas * second_endpoint[None]

    k0, k1 = jax.random.split(key)
    n0, _ = build_noise(k0, 1, H, W, C, train_width=train_width)
    n1, _ = build_noise(k1, 1, H, W, C, train_width=train_width)
    if first_endpoint is not None:
        p0 = first_endpoint[None]
        p1 = n0
    else:
        p0, p1 = n0, n1

    # noise[i] = 2*noise[i-1] - noise[i-2]  ==  p0 + i*(p1 - p0).
    steps = jnp.arange(B, dtype=jnp.float32).reshape(B, 1, 1, 1)
    noise = p0 + steps * (p1 - p0)

    current_var = jnp.var(noise)
    noise = noise * jnp.sqrt(variance / current_var)
    if first_endpoint is not None:
        noise = noise + (first_endpoint[None] - noise[0:1])
    return noise
