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

    @pytest.mark.parametrize("N,chunk", [(256, 256), (512, 128)])
    def test_pallas_interpret_matches_reference(self, N, chunk):
        """Run the streaming Pallas kernels in interpreter mode (CPU).

        The multi-chunk case exercises the online (flash-style) column
        softmax rescaling across sequence chunks.
        """
        from jax.experimental.pallas import tpu as pltpu
        from diffusynth_tpu.ops.linear_attention import linear_attention_pallas

        q, k, v = self._random_qkv(B=2, N=N, h=4, d=32)
        scale = 32 ** -0.5
        expect = np.asarray(linear_attention_jnp(q, k, v, scale))

        B, _, h, d = q.shape
        with pltpu.force_tpu_interpret_mode():
            out = linear_attention_pallas(
                q.reshape(B, N, h * d), k.reshape(B, N, h * d),
                v.reshape(B, N, h * d), h, d, scale, chunk=chunk,
            )
        np.testing.assert_allclose(
            np.asarray(out).reshape(B, N, h, d), expect, atol=1e-5)

    def test_dispatcher_cpu_fallback(self):
        q, k, v = self._random_qkv()
        out = linear_cross_attention(q, k, v, 4, 32, 32 ** -0.5)
        expect = linear_attention_jnp(q, k, v, 32 ** -0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                                   atol=1e-5)

    def test_blocked_matches_reference(self):
        from diffusynth_tpu.ops.linear_attention import (
            linear_attention_blocked,
        )

        q, k, v = self._random_qkv(B=3, N=96, h=4, d=32, seed=7)
        scale = 32 ** -0.5
        out = linear_attention_blocked(q, k, v, scale)
        expect = linear_attention_jnp(q, k, v, scale)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                                   atol=1e-5)

    def test_blocked_non128_falls_back(self):
        """Dispatcher uses the per-head path when h*d isn't tile-aligned."""
        q, k, v = self._random_qkv(B=1, N=32, h=2, d=16)
        out = linear_cross_attention(q, k, v, 2, 16, 16 ** -0.5)
        expect = linear_attention_jnp(q, k, v, 16 ** -0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                                   atol=1e-6)
