"""Shape/dtype/structure tests for the flax model zoo."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusynth_tpu.configs import (
    MultiModalConfig,
    TimbreEncoderConfig,
    UNetConfig,
    VQGANConfig,
)
from diffusynth_tpu.nn import (
    ConditionedUnet,
    GANDiscriminator,
    MultiModalModel,
    TimbreEncoder,
    VQGAN,
    VQGANDiscriminator,
)
from diffusynth_tpu.nn.vq import VectorQuantizer, VectorQuantizerEMA

KEY = jax.random.key(0)

# Tiny geometry: full 512x256 spectrograms are too slow for unit tests.
SMALL_VQGAN = VQGANConfig(hidden_channels=(16, 32), attn_pos=(16, 32),
                          num_embeddings=64, num_groups=8)
SMALL_UNET = UNetConfig(down_dims=(8, 8, 16, 32), up_dims=(32, 32, 16, 8),
                        label_emb_dim=16)


class TestVQ:
    def test_plain_quantizer(self):
        vq = VectorQuantizer(num_embeddings=16, embedding_dim=4)
        z = jax.random.normal(KEY, (2, 8, 8, 4))
        params = vq.init(KEY, z)
        quantized, loss, aux = vq.apply(params, z)
        assert quantized.shape == z.shape
        assert loss.shape == ()
        assert aux["indices"].shape == (2, 8, 8)
        assert 1.0 <= float(aux["perplexity"]) <= 16.0

    def test_straight_through_gradient(self):
        vq = VectorQuantizer(num_embeddings=16, embedding_dim=4)
        z = jax.random.normal(KEY, (1, 4, 4, 4))
        params = vq.init(KEY, z)

        def f(z):
            q, _, _ = vq.apply(params, z)
            return jnp.sum(q)

        g = jax.grad(f)(z)
        # Straight-through: dq/dz == identity.
        np.testing.assert_allclose(np.asarray(g), 1.0)

    def test_ema_updates_codebook(self):
        vq = VectorQuantizerEMA(num_embeddings=16, embedding_dim=4, decay=0.5)
        z = jax.random.normal(KEY, (2, 8, 8, 4))
        variables = vq.init(KEY, z, train=False)
        before = np.asarray(variables["vq"]["_embedding"])
        (_, _, _), mutated = vq.apply(variables, z, train=True, mutable=("vq",))
        after = np.asarray(mutated["vq"]["_embedding"])
        assert not np.allclose(before, after)
        # Eval mode must not change state.
        out = vq.apply(variables, z, train=False)
        assert len(out) == 3

    def test_quantized_values_come_from_codebook(self):
        vq = VectorQuantizer(num_embeddings=8, embedding_dim=4)
        z = jax.random.normal(KEY, (1, 4, 4, 4))
        params = vq.init(KEY, z)
        quantized, _, aux = vq.apply(params, z)
        codebook = np.asarray(params["params"]["_embedding"])
        q = np.asarray(quantized).reshape(-1, 4)
        idx = np.asarray(aux["indices"]).reshape(-1)
        np.testing.assert_allclose(q, codebook[idx], atol=1e-6)


class TestVQGAN:
    def test_full_forward(self):
        model = VQGAN(SMALL_VQGAN)
        x = jax.random.normal(KEY, (2, 64, 32, 3))
        variables = model.init(KEY, x)
        vq_loss, recon, aux = model.apply(variables, x)
        assert recon.shape == x.shape
        assert vq_loss.shape == ()
        # STFT+ head ranges: softplus mag >= 0, tanh phases in [-1, 1].
        r = np.asarray(recon)
        assert (r[..., 0] >= 0).all()
        assert (np.abs(r[..., 1:]) <= 1 + 1e-6).all()

    def test_latent_geometry(self):
        """2 hidden levels -> spatial /4, channels == embedding_dim."""
        model = VQGAN(SMALL_VQGAN)
        x = jax.random.normal(KEY, (1, 64, 32, 3))
        variables = model.init(KEY, x)
        z = model.apply(variables, x, method=model.encode)
        assert z.shape == (1, 16, 8, SMALL_VQGAN.embedding_dim)

    def test_split_encode_quantize_decode(self):
        model = VQGAN(SMALL_VQGAN)
        x = jax.random.normal(KEY, (1, 64, 32, 3))
        variables = model.init(KEY, x)
        z = model.apply(variables, x, method=model.encode)
        q, _, _ = model.apply(variables, z, method=model.quantize)
        recon = model.apply(variables, q, method=model.decode)
        assert recon.shape == x.shape

    def test_discriminator(self):
        disc = VQGANDiscriminator()
        x = jax.random.normal(KEY, (2, 64, 32, 3))
        variables = disc.init(KEY, x)
        logits = disc.apply(variables, x)
        assert logits.shape == (2, 1)


class TestUNet:
    @pytest.mark.parametrize("width", [16, 20])  # 20: non-multiple-of-8 path
    def test_forward_shapes(self, width):
        model = ConditionedUnet(SMALL_UNET)
        x = jax.random.normal(KEY, (2, 32, width, 4))
        t = jnp.array([5, 100])
        cond = jax.random.normal(KEY, (2, SMALL_UNET.label_emb_dim))
        variables = model.init(KEY, x, t, cond)
        out = model.apply(variables, x, t, cond)
        assert out.shape == x.shape

    def test_unconditional(self):
        model = ConditionedUnet(SMALL_UNET)
        x = jax.random.normal(KEY, (1, 32, 16, 4))
        t = jnp.array([0])
        variables = model.init(KEY, x, t, None)
        out = model.apply(variables, x, t, None)
        assert out.shape == x.shape

    def test_condition_changes_output(self):
        model = ConditionedUnet(SMALL_UNET)
        x = jax.random.normal(KEY, (1, 32, 16, 4))
        t = jnp.array([10])
        c1 = jnp.zeros((1, SMALL_UNET.label_emb_dim))
        c2 = jnp.ones((1, SMALL_UNET.label_emb_dim))
        variables = model.init(KEY, x, t, c1)
        o1 = model.apply(variables, x, t, c1)
        o2 = model.apply(variables, x, t, c2)
        assert not np.allclose(np.asarray(o1), np.asarray(o2))

    def test_cfg_dual_matches_naive_double(self):
        """cfg_dual (CFG prefix sharing) must equal the plain batch-double:
        apply(x, t, [uncond; cond], cfg_dual=True) ==
        apply(cat([x, x]), cat([t, t]), [uncond; cond])."""
        model = ConditionedUnet(SMALL_UNET)
        x = jax.random.normal(KEY, (2, 32, 16, 4))
        t = jnp.array([5, 100])
        cond = jax.random.normal(
            jax.random.PRNGKey(7), (4, SMALL_UNET.label_emb_dim))
        variables = model.init(KEY, x, t, cond[:2])
        naive = model.apply(variables, jnp.concatenate([x, x]),
                            jnp.concatenate([t, t]), cond)
        dual = model.apply(variables, x, t, cond, cfg_dual=True)
        assert dual.shape == (4, 32, 16, 4)
        np.testing.assert_allclose(np.asarray(dual), np.asarray(naive),
                                   atol=1e-6)

    def test_linear_cat_attention_variant(self):
        cfg = SMALL_UNET.replace(attn_type="linear_cat")
        model = ConditionedUnet(cfg)
        x = jax.random.normal(KEY, (1, 32, 16, 4))
        t = jnp.array([10])
        cond = jax.random.normal(KEY, (1, cfg.label_emb_dim))
        variables = model.init(KEY, x, t, cond)
        assert model.apply(variables, x, t, cond).shape == x.shape

    def test_resnet_block_variant(self):
        cfg = SMALL_UNET.replace(use_convnext=False)
        model = ConditionedUnet(cfg)
        x = jax.random.normal(KEY, (1, 32, 16, 4))
        t = jnp.array([10])
        cond = jax.random.normal(KEY, (1, cfg.label_emb_dim))
        variables = model.init(KEY, x, t, cond)
        assert model.apply(variables, x, t, cond).shape == x.shape

    def test_tpu128_preset_wires_up(self):
        """configs.UNET_TPU128 (MXU-tile-aligned dims, NOT reference-parity)
        builds and preserves latent shape. eval_shape only — a real init of
        the 119M-param model takes minutes on CPU; on-hardware numbers are
        RESULTS_r2.md H11."""
        from diffusynth_tpu.configs import UNET_PRESETS, UNET_TPU128

        assert UNET_PRESETS["tpu128"] is UNET_TPU128
        assert all(d % 128 == 0 for d in UNET_TPU128.down_dims)
        assert all(d % 128 == 0 for d in UNET_TPU128.up_dims)
        model = ConditionedUnet(UNET_TPU128)
        x = jax.ShapeDtypeStruct((2, 128, 16, 4), jnp.float32)
        t = jax.ShapeDtypeStruct((2,), jnp.int32)
        cond = jax.ShapeDtypeStruct((2, UNET_TPU128.label_emb_dim),
                                    jnp.float32)
        variables = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                                   x, t, cond)
        n_params = sum(int(np.prod(p.shape)) for p in
                       jax.tree_util.tree_leaves(variables))
        assert 100e6 < n_params < 140e6  # 119.0M measured
        out = jax.eval_shape(model.apply, variables, x, t, cond)
        assert out.shape == x.shape


class TestTimbreEncoder:
    def test_forward(self):
        cfg = TimbreEncoderConfig(input_dim=64, feature_dim=32, hidden_dim=48,
                                  num_layers=2)
        model = TimbreEncoder(cfg)
        x = jax.random.normal(KEY, (2, 16, 12, 4))  # C*H = 64
        variables = model.init(KEY, x)
        feature, inst, fam, vel, qual = model.apply(variables, x)
        assert feature.shape == (2, 48)
        assert inst.shape == (2, cfg.num_instrument_classes)
        assert fam.shape == (2, cfg.num_instrument_family_classes)
        assert vel.shape == (2, cfg.num_velocity_classes)
        assert qual.shape == (2, cfg.num_qualities)
        # log-probs sum to 1 in prob space; qualities in (0, 1).
        np.testing.assert_allclose(np.exp(np.asarray(inst)).sum(-1), 1.0, rtol=1e-4)
        assert ((np.asarray(qual) > 0) & (np.asarray(qual) < 1)).all()


class TestMultiModal:
    def test_contrastive_loss_and_features(self):
        tcfg = TimbreEncoderConfig(input_dim=64, feature_dim=32, hidden_dim=48,
                                   num_layers=1)
        mcfg = MultiModalConfig(text_feature_dim=24, spectrogram_feature_dim=48,
                                multi_modal_emb_dim=32)
        model = MultiModalModel(mcfg, tcfg)
        latents = jax.random.normal(KEY, (4, 16, 12, 4))
        text_feats = jax.random.normal(KEY, (4, 24))
        variables = model.init(KEY, latents, text_feats)
        loss = model.apply(variables, latents, text_feats)
        assert loss.shape == ()
        assert np.isfinite(float(loss))
        proj = model.apply(variables, text_feats, method=model.get_text_features)
        assert proj.shape == (4, 32)
        timb = model.apply(variables, latents, method=model.get_timbre_features)
        assert timb.shape == (4, 32)


class TestGANDiscriminator:
    def test_forward(self):
        disc = GANDiscriminator(label_emb_dim=16)
        x = jax.random.normal(KEY, (2, 32, 16, 4))
        emb = jax.random.normal(KEY, (2, 16))
        variables = disc.init(KEY, x, emb)
        out = disc.apply(variables, x, emb)
        assert out.shape == (2, 1)
