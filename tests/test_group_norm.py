"""Fused GroupNorm: numerics vs nn.GroupNorm, gradients, interpret mode."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusynth_tpu.nn.layers import FusedGroupNorm
from diffusynth_tpu.ops.group_norm import (
    fused_group_norm,
    group_norm_auto,
    group_norm_reference,
)


class TestGroupNormNumerics:
    @pytest.mark.parametrize("shape", [(2, 8, 4, 16), (3, 32, 96)])
    def test_reference_matches_flax(self, shape):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32)) * 3 + 1
        C = shape[-1]
        scale = jnp.asarray(rng.standard_normal(C).astype(np.float32))
        bias = jnp.asarray(rng.standard_normal(C).astype(np.float32))
        ours = group_norm_reference(x, scale, bias, 1e-5)
        gn = nn.GroupNorm(num_groups=1, epsilon=1e-5)
        flax_out = gn.apply({"params": {"scale": scale, "bias": bias}}, x)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(flax_out),
                                   atol=1e-5, rtol=1e-5)

    def test_pallas_interpret_matches_reference(self):
        from jax.experimental.pallas import tpu as pltpu

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((2, 16, 8, 32)).astype(np.float32))
        scale = jnp.asarray(rng.standard_normal(32).astype(np.float32))
        bias = jnp.asarray(rng.standard_normal(32).astype(np.float32))
        expect = group_norm_reference(x, scale, bias, 1e-5)
        with pltpu.force_tpu_interpret_mode():
            out = fused_group_norm(x, scale, bias, 1e-5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                                   atol=1e-5)

    def test_gradients_flow(self):
        """custom_vjp backward must match differentiating the reference."""
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((2, 4, 4, 8)).astype(np.float32))
        scale = jnp.ones(8)
        bias = jnp.zeros(8)

        def loss_auto(x, s, b):
            return jnp.sum(jnp.square(group_norm_auto(x, s, b, 1e-5,
                                                      use_pallas=False)))

        def loss_ref(x, s, b):
            return jnp.sum(jnp.square(group_norm_reference(x, s, b, 1e-5)))

        g1 = jax.grad(loss_auto, argnums=(0, 1, 2))(x, scale, bias)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=1e-4)

    def test_module_param_names_match_groupnorm(self):
        """Checkpoint compatibility: params are scale/bias of shape (C,)."""
        m = FusedGroupNorm()
        x = jnp.ones((1, 4, 4, 16))
        v = m.init(jax.random.key(0), x)
        assert set(v["params"]) == {"scale", "bias"}
        assert v["params"]["scale"].shape == (16,)
        out = m.apply(v, x)
        assert out.shape == x.shape
