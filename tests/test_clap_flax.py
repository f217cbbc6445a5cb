"""Parity of the flax CLAP text tower vs the in-process torch reference.

The reference conditions on ClapModel.get_text_features (app.py:44-59) =
L2-normalize(text_projection(pooler(text_model(ids)))). transformers is
installed, so the torch text branch runs in-process with random weights —
the same oracle pattern as tests/test_compat.py.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from diffusynth_tpu.text.clap_flax import (  # noqa: E402
    ClapTextTower,
    ClapTextTowerConfig,
    convert_clap_text,
)


def _tiny_cfg():
    return transformers.ClapTextConfig(
        vocab_size=120,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=48,
        type_vocab_size=1,
        projection_dim=16,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )


@pytest.fixture(scope="module")
def models():
    hf_cfg = _tiny_cfg()
    torch.manual_seed(0)
    tmodel = transformers.ClapTextModelWithProjection(hf_cfg)
    tmodel.eval()
    cfg = ClapTextTowerConfig.from_hf(hf_cfg)
    params = convert_clap_text(tmodel.state_dict(), cfg)
    return tmodel, ClapTextTower(cfg), params, cfg


def _torch_features(tmodel, ids, mask):
    with torch.no_grad():
        out = tmodel(input_ids=torch.tensor(ids),
                     attention_mask=torch.tensor(mask))
        emb = out.text_embeds
        return torch.nn.functional.normalize(emb, dim=-1).numpy()


class TestClapTextParity:
    def test_padded_batch_matches_torch(self, models):
        tmodel, fmodel, params, cfg = models
        rng = np.random.default_rng(1)
        B, L = 3, 11
        ids = rng.integers(3, 120, size=(B, L))
        mask = np.ones((B, L), np.int64)
        # Right-pad rows to different lengths with pad_token_id (1), the
        # tokenizer's padding convention.
        for b, n in enumerate((11, 7, 4)):
            ids[b, n:] = cfg.pad_token_id
            mask[b, n:] = 0
        ref = _torch_features(tmodel, ids, mask)
        got = np.asarray(fmodel.apply(
            {"params": params}, jnp.asarray(ids, jnp.int32),
            jnp.asarray(mask, jnp.int32)))
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)

    def test_no_mask_defaults_to_full(self, models):
        tmodel, fmodel, params, cfg = models
        rng = np.random.default_rng(2)
        ids = rng.integers(3, 120, size=(2, 6))
        ref = _torch_features(tmodel, ids, np.ones_like(ids))
        got = np.asarray(fmodel.apply(
            {"params": params}, jnp.asarray(ids, jnp.int32)))
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)

    def test_padding_is_inert(self, models):
        """Extra pad columns must not change a row's features (mask bias +
        fairseq position ids keep padding out of every reduction)."""
        _, fmodel, params, cfg = models
        rng = np.random.default_rng(3)
        ids = rng.integers(3, 120, size=(1, 5))
        a = np.asarray(fmodel.apply(
            {"params": params}, jnp.asarray(ids, jnp.int32),
            jnp.ones((1, 5), jnp.int32)))
        padded = np.full((1, 9), cfg.pad_token_id, np.int64)
        padded[:, :5] = ids
        mask = np.zeros((1, 9), np.int64)
        mask[:, :5] = 1
        b = np.asarray(fmodel.apply(
            {"params": params}, jnp.asarray(padded, jnp.int32),
            jnp.asarray(mask, jnp.int32)))
        np.testing.assert_allclose(a, b, atol=2e-6)

    def test_unit_norm(self, models):
        _, fmodel, params, _ = models
        ids = np.arange(3, 9)[None, :]
        got = np.asarray(fmodel.apply(
            {"params": params}, jnp.asarray(ids, jnp.int32)))
        np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0,
                                   atol=1e-5)

    def test_converter_rejects_wrong_depth(self, models):
        tmodel, _, _, cfg = models
        import dataclasses

        bad = dataclasses.replace(cfg, num_hidden_layers=3)
        with pytest.raises(KeyError):
            convert_clap_text(tmodel.state_dict(), bad)
