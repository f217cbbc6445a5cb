"""Pallas kernel tests (interpret mode on CPU) vs the jnp reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusynth_tpu.ops.linear_attention import (
    linear_attention_jnp,
    linear_cross_attention,
)


class TestLinearAttention:
    def _random_qkv(self, B=2, N=64, h=4, d=32, seed=0):
        rng = np.random.default_rng(seed)
        mk = lambda: jnp.asarray(
            rng.standard_normal((B, N, h, d)).astype(np.float32))
        return mk(), mk(), mk()

    def test_jnp_reference_matches_layer_math(self):
        """The standalone op must equal the math inside the flax layers."""
        q, k, v = self._random_qkv()
        scale = 32 ** -0.5
        out = linear_attention_jnp(q, k, v, scale)
        # Inline re-derivation (same as LinearCrossAttentionAdd body).
        q2 = jax.nn.softmax(q, axis=-1) * scale
        k2 = jax.nn.softmax(k, axis=1)
        ctx = jnp.einsum("bnhd,bnhe->bhde", k2, v)
        expect = jnp.einsum("bhde,bnhd->bnhe", ctx, q2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                                   atol=1e-6)

    def test_pallas_interpret_matches_reference(self):
        """Run the Pallas kernel in interpreter mode (works on CPU)."""
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        import functools
        from diffusynth_tpu.ops import linear_attention as la

        q, k, v = self._random_qkv(B=2, N=64, h=4, d=32)
        scale = 32 ** -0.5
        expect = np.asarray(linear_attention_jnp(q, k, v, scale))

        B, N, h, d = q.shape
        kernel = functools.partial(la._attention_kernel, heads=h,
                                   dim_head=d, scale=scale)
        out = pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[pl.BlockSpec((1, N, h * d), lambda b: (b, 0, 0))] * 3,
            out_specs=pl.BlockSpec((1, N, h * d), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, N, h * d), q.dtype),
            interpret=True,
        )(q.reshape(B, N, h * d), k.reshape(B, N, h * d),
          v.reshape(B, N, h * d))
        np.testing.assert_allclose(
            np.asarray(out).reshape(B, N, h, d), expect, atol=1e-5)

    def test_dispatcher_cpu_fallback(self):
        q, k, v = self._random_qkv()
        out = linear_cross_attention(q, k, v, 4, 32, 32 ** -0.5)
        expect = linear_attention_jnp(q, k, v, 32 ** -0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                                   atol=1e-6)
