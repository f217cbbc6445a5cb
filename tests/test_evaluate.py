"""Evaluation-loop tests (tiny models, synthetic data)."""

import pytest

pytestmark = pytest.mark.slow

import jax
import numpy as np

from diffusynth_tpu.configs import (
    ContrastiveTrainConfig,
    MultiModalConfig,
    VQGANConfig,
    VQGANTrainConfig,
)
from diffusynth_tpu.nn import (
    ConditionedUnet,
    GANDiscriminator,
    MultiModalModel,
    TimbreEncoder,
    VQGAN,
    VQGANDiscriminator,
)
from diffusynth_tpu.train import SyntheticNSynthDataset, data_iterator
from diffusynth_tpu.train.evaluate import (
    evaluate_contrastive,
    evaluate_diffusion,
    evaluate_gan,
    evaluate_timbre,
    evaluate_vqgan,
)
from tests.test_train import SMALL_TIMBRE, SMALL_UNET

import jax.numpy as jnp


def _cond_lookup(attrs):
    return np.stack([np.full(16, a["instrument"] / 8.0, np.float32)
                     for a in attrs])


class TestEvaluate:
    def test_diffusion(self):
        ds = SyntheticNSynthDataset(n=16, shape=(8, 8, 4))
        it = data_iterator(ds, 4, seed=0)
        unet = ConditionedUnet(SMALL_UNET)
        data0, attrs0 = next(it)
        params = unet.init(jax.random.key(0), jnp.asarray(data0),
                           jnp.zeros(4, jnp.int32),
                           jnp.asarray(_cond_lookup(attrs0)))
        loss = evaluate_diffusion(unet, params, it, _cond_lookup,
                                  timesteps=50, n_batches=3)
        assert np.isfinite(loss) and loss > 0

    def test_vqgan(self):
        mc = VQGANConfig(hidden_channels=(8, 16), attn_pos=(),
                         num_embeddings=16, num_groups=4)
        vqgan, disc = VQGAN(mc), VQGANDiscriminator()
        ds = SyntheticNSynthDataset(n=8, shape=(32, 16, 3))
        it = data_iterator(ds, 2, seed=1)
        data0, _ = next(it)
        g_vars = vqgan.init(jax.random.key(0), jnp.asarray(data0))
        d_params = disc.init(jax.random.key(1), jnp.asarray(data0))
        loss = evaluate_vqgan(vqgan, disc, g_vars, d_params, it,
                              VQGANTrainConfig(), n_batches=2)
        assert np.isfinite(loss)

    def test_timbre(self):
        model = TimbreEncoder(SMALL_TIMBRE)
        ds = SyntheticNSynthDataset(n=16, shape=(8, 8, 4), n_instruments=4)
        it = data_iterator(ds, 4, seed=2)
        data0, _ = next(it)
        params = model.init(jax.random.key(0), jnp.asarray(data0))
        loss = evaluate_timbre(model, params, it, n_batches=2)
        assert np.isfinite(loss)

    def test_contrastive(self):
        mcfg = MultiModalConfig(text_feature_dim=16,
                                spectrogram_feature_dim=24,
                                multi_modal_emb_dim=16, dropout=0.0)
        model = MultiModalModel(mcfg, SMALL_TIMBRE)
        ds = SyntheticNSynthDataset(n=16, shape=(8, 8, 4))
        it = data_iterator(ds, 4, seed=3)
        data0, attrs0 = next(it)
        params = model.init(jax.random.key(0), jnp.asarray(data0),
                            jnp.asarray(_cond_lookup(attrs0)))
        loss = evaluate_contrastive(model, params, it, _cond_lookup,
                                    n_batches=2)
        assert np.isfinite(loss)

    def test_gan(self):
        gen = ConditionedUnet(SMALL_UNET)
        disc = GANDiscriminator(label_emb_dim=16)
        ds = SyntheticNSynthDataset(n=8, shape=(16, 16, 4))
        it = data_iterator(ds, 2, seed=4)
        data0, attrs0 = next(it)
        cond0 = jnp.asarray(_cond_lookup(attrs0))
        g_params = gen.init(jax.random.key(0), jnp.asarray(data0),
                            jnp.zeros(2, jnp.int32), cond0)
        d_params = disc.init(jax.random.key(1), jnp.asarray(data0), cond0)
        ra, fa = evaluate_gan(gen, disc, g_params, d_params, it,
                              _cond_lookup, n_batches=2)
        assert 0.0 <= ra <= 1.0 and 0.0 <= fa <= 1.0
