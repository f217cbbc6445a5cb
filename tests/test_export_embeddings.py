"""The caption-embedding export workflow (the reference's contrastive
notebook cell 10): caption JSONs -> per-caption embeddings through the
trained MMM projection -> mapping consumable by train.run --captions."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from diffusynth_tpu.configs import (
    AppConfig,
    MultiModalConfig,
    TimbreEncoderConfig,
)
from diffusynth_tpu.nn.multimodal import MultiModalModel
from diffusynth_tpu.train.checkpoints import Checkpointer
from diffusynth_tpu.train.export_embeddings import export_embeddings
from diffusynth_tpu.train.run import _mapping_lookup


def _tiny_app():
    return AppConfig(
        # input_dim must equal channels * latent_height of the (default)
        # audio geometry: 4 * 128.
        timbre=TimbreEncoderConfig(input_dim=512, feature_dim=24,
                                   hidden_dim=32, num_layers=1),
        multimodal=MultiModalConfig(text_feature_dim=12,
                                    spectrogram_feature_dim=24,
                                    multi_modal_emb_dim=16, dropout=0.0),
    )


def test_export_roundtrip(tmp_path):
    app = _tiny_app()
    a = app.audio

    # A checkpoint exactly as train.run --model contrastive writes it.
    model = MultiModalModel(app.multimodal, app.timbre)
    variables = jax.jit(model.init)(
        jax.random.key(0),
        jnp.zeros((1, a.latent_height, app.diffusion.train_width,
                   a.channels)),
        jnp.zeros((1, app.multimodal.text_feature_dim)))
    ckpt = Checkpointer(str(tmp_path / "models"))
    ckpt.save("mmm", "MMM", {"variables": variables, "step": 1})

    captions = {
        "acoustic_organ_01": ["a churchy organ", "a pipe organ"],
        "electronic_lead_10": ["a bright synth lead"],
    }
    # Two files exercising the merge (reference merges keyword/phrase files).
    p1 = tmp_path / "keywords.json"
    p2 = tmp_path / "phrases.json"
    p1.write_text(json.dumps({k: v[:1] for k, v in captions.items()}))
    p2.write_text(json.dumps(
        {k: v[1:] for k, v in captions.items() if v[1:]}))
    out = tmp_path / "mapping.json"

    n = export_embeddings([str(p1), str(p2)], str(out),
                          mmm_dir=str(tmp_path / "models"), mmm_name="mmm",
                          app_config=app)
    assert n == 2

    mapping = json.loads(out.read_text())
    assert set(mapping) == set(captions)
    emb_dim = app.multimodal.multi_modal_emb_dim
    assert len(mapping["acoustic_organ_01"]) == 2  # one per caption
    assert len(mapping["acoustic_organ_01"][0]) == emb_dim
    # Projection actually applied: raw hash features have dim 12, not 16.
    assert len(mapping["electronic_lead_10"][0]) == emb_dim

    # The exported mapping is exactly what --captions consumes.
    lookup = _mapping_lookup(str(out), emb_dim, seed=0)
    attrs = [{"instrument_source_str": "acoustic",
              "instrument_family_str": "organ", "qualities": [0, 1]}]
    feats = lookup(attrs)
    assert feats.shape == (1, emb_dim)
    variants = np.asarray(mapping["acoustic_organ_01"], np.float32)
    assert any(np.allclose(feats[0], v) for v in variants)


def test_export_without_mmm(tmp_path):
    """--mmm omitted: raw text-encoder features (use_pretrained_CLAP path)."""
    app = _tiny_app()
    p = tmp_path / "captions.json"
    p.write_text(json.dumps({"synthetic_brass_11": ["a brass stab"]}))
    out = tmp_path / "mapping.json"
    n = export_embeddings([str(p)], str(out), app_config=app)
    assert n == 1
    mapping = json.loads(out.read_text())
    assert len(mapping["synthetic_brass_11"][0]) == \
        app.multimodal.text_feature_dim
