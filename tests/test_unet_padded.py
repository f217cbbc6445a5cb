"""Channel-padded Pallas-chain U-Net path == unpadded path (same params).

channel_pad=True runs the U-Net with activations zero-padded to 128-lane
multiples (nn/padding.py) and params scattered per call; on CPU the fused
kernels dispatch to their XLA references, so this pins the padding
bookkeeping (segment layouts, weight scattering, real-n GroupNorm) exactly.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusynth_tpu.configs import UNetConfig
from diffusynth_tpu.nn.unet import ConditionedUnet


def _tiny_cfg(**kw):
    return UNetConfig(
        in_dim=4,
        down_dims=(16, 16, 32, 48),
        up_dims=(48, 48, 32, 16),
        mid_depth=3,
        label_emb_dim=24,
        **kw,
    )


class TestPaddedChain:
    @pytest.mark.parametrize("conditioned", [True, False])
    def test_matches_unpadded(self, conditioned):
        cfg_u = _tiny_cfg(channel_pad=False)
        cfg_p = _tiny_cfg(channel_pad=True)
        model_u = ConditionedUnet(cfg_u)
        model_p = ConditionedUnet(cfg_p)

        key = jax.random.PRNGKey(0)
        B, H, W = 2, 32, 16
        x = jax.random.normal(key, (B, H, W, 4), jnp.float32)
        t = jnp.array([3, 700], jnp.int32)
        cond = (jax.random.normal(jax.random.PRNGKey(1), (B, 512))
                if conditioned else None)

        params = model_u.init(jax.random.PRNGKey(2), x, t, cond)
        out_u = model_u.apply(params, x, t, cond)
        out_p = model_p.apply(params, x, t, cond)
        assert out_p.shape == out_u.shape
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_u),
                                   atol=2e-4, rtol=1e-3)

    def test_matches_unpadded_nonpow2_width(self):
        """Width-48-bucket-style spatial dims (odd widths at inner levels;
        the mid level falls back to the reference body)."""
        cfg_u = _tiny_cfg(channel_pad=False)
        cfg_p = _tiny_cfg(channel_pad=True)
        model_u = ConditionedUnet(cfg_u)
        model_p = ConditionedUnet(cfg_p)
        key = jax.random.PRNGKey(7)
        x = jax.random.normal(key, (1, 24, 12, 4), jnp.float32)
        t = jnp.array([42], jnp.int32)
        cond = jax.random.normal(jax.random.PRNGKey(8), (1, 512))
        params = model_u.init(jax.random.PRNGKey(9), x, t, cond)
        out_u = model_u.apply(params, x, t, cond)
        out_p = model_p.apply(params, x, t, cond)
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_u),
                                   atol=2e-4, rtol=1e-3)

    def test_param_tree_identical(self):
        """The padded path declares the exact same params (names, shapes) —
        checkpoints and the torch converter see no difference."""
        cfg_u = _tiny_cfg(channel_pad=False)
        cfg_p = _tiny_cfg(channel_pad=True)
        key = jax.random.PRNGKey(0)
        B, H, W = 1, 32, 16
        x = jnp.zeros((B, H, W, 4))
        t = jnp.zeros((B,), jnp.int32)
        cond = jnp.zeros((B, 512))
        p_u = ConditionedUnet(cfg_u).init(key, x, t, cond)
        p_p = ConditionedUnet(cfg_p).init(key, x, t, cond)
        shapes_u = jax.tree_util.tree_map(lambda a: a.shape, p_u)
        shapes_p = jax.tree_util.tree_map(lambda a: a.shape, p_p)
        assert shapes_u == shapes_p

    def test_gradients_flow_padded(self):
        cfg_p = _tiny_cfg(channel_pad=True)
        model = ConditionedUnet(cfg_p)
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (1, 32, 16, 4))
        t = jnp.array([5], jnp.int32)
        params = model.init(jax.random.PRNGKey(1), x, t, None)

        def loss(p):
            return jnp.sum(model.apply(p, x, t, None) ** 2)

        g = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(leaf)).all() for leaf in leaves)
        assert any(float(jnp.abs(leaf).max()) > 0 for leaf in leaves)


class TestPaddingHelpers:
    def test_scatter_gather_roundtrip(self):
        from diffusynth_tpu.nn import padding as pdg

        segs = ((96, 128), (192, 256))
        v = jnp.arange(288.0)
        s = pdg.scatter_vec(v, segs)
        assert s.shape == (384,)
        assert float(s[96:128].sum()) == 0.0
        np.testing.assert_array_equal(np.asarray(pdg.gather_vec(s, segs)),
                                      np.asarray(v))

    def test_scatter_rows_zero_lanes(self):
        from diffusynth_tpu.nn import padding as pdg

        w = jnp.ones((3, 3, 96, 7))
        wp = pdg.scatter_rows(w, ((96, 128),))
        assert wp.shape == (3, 3, 128, 7)
        assert float(wp[:, :, 96:, :].sum()) == 0.0
