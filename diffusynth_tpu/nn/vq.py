"""Vector quantization: plain (gradient codebook) and EMA variants.

TPU re-design of reference: model/VQGAN.py:30-146. Differences from the torch
version, chosen for the hardware:

  * Codebook lookup is an argmin + gather (not a one-hot matmul) and the
    EMA statistics use segment_sum - O(N*K) distance compute stays on the
    MXU, everything else is O(N).
  * EMA state lives in a dedicated "vq" flax collection (not "params"), so
    optimizers never touch it; the train step threads it via mutable=("vq",).
  * Under pjit the batch is a global array, so cluster statistics are global
    automatically - no hand-written all-reduce (the reference is
    single-device and has none either).

Layout: NHWC; inputs are (B, H, W, D) with D == embedding_dim.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    """Explicit EMA quantizer state (mirrors reference buffers,
    VQGAN.py:91-93)."""

    embedding: jnp.ndarray      # (K, D)
    cluster_size: jnp.ndarray   # (K,)
    ema_w: jnp.ndarray          # (K, D)


def _nearest_codes(flat: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """Indices of nearest codebook rows by L2 distance (N, D) x (K, D)."""
    # ||x - e||^2 = ||x||^2 - 2 x.e + ||e||^2 ; the matmul rides the MXU.
    dot = jnp.dot(
        flat, codebook.T, preferred_element_type=jnp.float32
    )
    dist = (
        jnp.sum(flat * flat, axis=1, keepdims=True)
        - 2.0 * dot
        + jnp.sum(codebook * codebook, axis=1)[None, :]
    )
    return jnp.argmin(dist, axis=1)


def _perplexity(indices: jnp.ndarray, num_embeddings: int) -> jnp.ndarray:
    counts = jax.ops.segment_sum(
        jnp.ones_like(indices, dtype=jnp.float32), indices, num_embeddings
    )
    avg_probs = counts / indices.shape[0]
    return jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)))


class VectorQuantizer(nn.Module):
    """Gradient-trained codebook + straight-through estimator
    (reference: VQGAN.py:30-76)."""

    num_embeddings: int
    embedding_dim: int
    commitment_cost: float = 0.25

    @nn.compact
    def __call__(self, z: jnp.ndarray, train: bool = False):
        codebook = self.param(
            "_embedding",
            lambda key: jax.random.uniform(
                key,
                (self.num_embeddings, self.embedding_dim),
                minval=-1.0 / self.num_embeddings,
                maxval=1.0 / self.num_embeddings,
            ),
        )
        input_shape = z.shape
        flat = z.reshape(-1, self.embedding_dim).astype(jnp.float32)
        indices = _nearest_codes(flat, codebook)
        quantized = codebook[indices].reshape(input_shape)

        e_latent_loss = jnp.mean(
            jnp.square(jax.lax.stop_gradient(quantized) - z)
        )
        q_latent_loss = jnp.mean(jnp.square(quantized - jax.lax.stop_gradient(z)))
        loss = q_latent_loss + self.commitment_cost * e_latent_loss

        quantized = z + jax.lax.stop_gradient(quantized - z)
        perplexity = _perplexity(indices, self.num_embeddings)
        return quantized, loss, {
            "perplexity": perplexity,
            "indices": indices.reshape(input_shape[:-1]),
        }


class VectorQuantizerEMA(nn.Module):
    """EMA codebook with Laplace-smoothed cluster sizes
    (reference: VQGAN.py:78-146).

    When train=True the module updates its "vq" collection in place; callers
    must apply with mutable=("vq",).
    """

    num_embeddings: int
    embedding_dim: int
    commitment_cost: float = 0.25
    decay: float = 0.99
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, z: jnp.ndarray, train: bool = False):
        init = nn.initializers.normal(stddev=1.0)
        embedding = self.variable(
            "vq", "_embedding", init, self.make_rng("params") if self.is_initializing() else None,
            (self.num_embeddings, self.embedding_dim),
        )
        cluster_size = self.variable(
            "vq", "_ema_cluster_size", lambda *_: jnp.zeros(self.num_embeddings),
            None, None,
        )
        ema_w = self.variable(
            "vq", "_ema_w", init, self.make_rng("params") if self.is_initializing() else None,
            (self.num_embeddings, self.embedding_dim),
        )

        input_shape = z.shape
        flat = z.reshape(-1, self.embedding_dim).astype(jnp.float32)
        codebook = embedding.value
        indices = _nearest_codes(flat, codebook)
        quantized = codebook[indices].reshape(input_shape)

        if train:
            counts = jax.ops.segment_sum(
                jnp.ones_like(indices, dtype=jnp.float32),
                indices,
                self.num_embeddings,
            )
            new_cluster = cluster_size.value * self.decay + (1 - self.decay) * counts
            n = jnp.sum(new_cluster)
            smoothed = (
                (new_cluster + self.epsilon)
                / (n + self.num_embeddings * self.epsilon)
                * n
            )
            dw = jax.ops.segment_sum(flat, indices, self.num_embeddings)
            new_ema_w = ema_w.value * self.decay + (1 - self.decay) * dw
            cluster_size.value = smoothed
            ema_w.value = new_ema_w
            embedding.value = new_ema_w / smoothed[:, None]

        e_latent_loss = jnp.mean(
            jnp.square(jax.lax.stop_gradient(quantized) - z)
        )
        loss = self.commitment_cost * e_latent_loss

        quantized = z + jax.lax.stop_gradient(quantized - z)
        perplexity = _perplexity(indices, self.num_embeddings)
        return quantized, loss, {
            "perplexity": perplexity,
            "indices": indices.reshape(input_shape[:-1]),
        }
