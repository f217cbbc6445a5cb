"""Export the create_key -> caption-embedding mapping JSON.

The runnable equivalent of the reference's contrastive-pretrain notebook
cell 10 (colab_notebooks/contrastive-pretrain.ipynb): merge the GPT caption
JSONs (create_key -> list of caption texts), encode every caption with the
production text path (CLAP text tower -> trained multimodal projection,
reference: app.py:54-59), and write create_key -> [embedding, ...].

  python -m diffusynth_tpu.train.export_embeddings \\
      --captions keywords_drop_0.0.json phrases_drop_0.0.json \\
      --mmm models_jax --mmm-name mmm --out encodes2embeddings.json

The output is exactly what `train.run --captions` consumes, closing the
reference's workflow loop: contrastive train -> export -> diffusion train.
Without --mmm the raw text-encoder features are exported (the reference's
use_pretrained_CLAP=True path); without a local CLAP checkpoint the
deterministic hash stub stands in (and says so).
"""

from __future__ import annotations

import argparse
import json
from typing import Callable, Optional

import numpy as np


def load_mmm_text_apply(
    models_dir: str,
    name: str = "mmm",
    app_config=None,
) -> Callable[[np.ndarray], np.ndarray]:
    """Restore a trained MultiModalModel checkpoint (role "MMM", written by
    train.run --model contrastive) and return its get_text_features as a
    plain features->features callable (reference: multimodal_model.py:114)."""
    import jax
    import jax.numpy as jnp

    from diffusynth_tpu.configs import AppConfig
    from diffusynth_tpu.nn.multimodal import MultiModalModel
    from diffusynth_tpu.train.checkpoints import Checkpointer

    app = app_config or AppConfig()
    model = MultiModalModel(app.multimodal, app.timbre)
    a = app.audio
    latents = jnp.zeros((1, a.latent_height, app.diffusion.train_width,
                         a.channels))
    text = jnp.zeros((1, app.multimodal.text_feature_dim))
    template = jax.jit(model.init)(jax.random.key(0), latents, text)

    ckpt = Checkpointer(models_dir)
    if not ckpt.exists(name, "MMM"):
        raise FileNotFoundError(
            f"no MMM checkpoint under {models_dir!r} (name={name!r}); "
            f"train one with: python -m diffusynth_tpu.train.run "
            f"--model contrastive")
    variables = ckpt.restore(name, "MMM", {"variables": template,
                                           "step": 0})["variables"]
    apply = jax.jit(
        lambda feats: model.apply(variables, feats,
                                  method=model.get_text_features))

    def mmm_apply(feats: np.ndarray) -> np.ndarray:
        return np.asarray(apply(jnp.asarray(feats, jnp.float32)))

    return mmm_apply


def export_embeddings(
    caption_paths,
    out_path: str,
    mmm_dir: Optional[str] = None,
    mmm_name: str = "mmm",
    batch_size: int = 64,
    app_config=None,
) -> int:
    """Merge caption JSONs, encode every caption, write the mapping.
    Returns the number of keys written."""
    from diffusynth_tpu.dsp.utils import merge_dictionaries
    from diffusynth_tpu.text import MultiModalTextEncoder, get_text_encoder

    dicts = []
    for path in caption_paths:
        with open(path) as f:
            dicts.append(json.load(f))
    key_to_texts = merge_dictionaries(dicts)

    from diffusynth_tpu.configs import AppConfig

    app = app_config or AppConfig()
    # The MMM projection consumes text_feature_dim features; the hash
    # fallback must match it (CLAP is fixed at 512, the production value).
    encoder = get_text_encoder(feature_dim=app.multimodal.text_feature_dim)
    from diffusynth_tpu.text.encoders import HashTextEncoder

    if isinstance(getattr(encoder, "base", encoder), HashTextEncoder):
        print("[export] no local CLAP checkpoint: embeddings come from the "
              "deterministic hash stub (structure-only; re-export once CLAP "
              "weights are available)")
    if mmm_dir is not None:
        encoder = MultiModalTextEncoder(
            encoder, load_mmm_text_apply(mmm_dir, mmm_name, app),
            feature_dim=app.multimodal.multi_modal_emb_dim)

    # Encode all captions in one deduplicated batched pass, then scatter
    # back per key (the notebook loops one text at a time).
    all_texts = sorted({t for texts in key_to_texts.values() for t in texts})
    feats = {}
    for i in range(0, len(all_texts), batch_size):
        chunk = all_texts[i:i + batch_size]
        embs = encoder.encode(chunk)
        feats.update({t: e for t, e in zip(chunk, embs)})

    mapping = {
        key: [[float(x) for x in feats[t]] for t in texts]
        for key, texts in key_to_texts.items()
    }
    with open(out_path, "w") as f:
        json.dump(mapping, f)
    return len(mapping)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--captions", nargs="+", required=True,
                        help="caption JSONs (create_key -> [text, ...]); "
                             "merged like the reference's keywords/phrases/"
                             "synonym files")
    parser.add_argument("--out", required=True)
    parser.add_argument("--mmm", default=None,
                        help="models dir with a trained MMM checkpoint; "
                             "omit to export raw text-encoder features")
    parser.add_argument("--mmm-name", default="mmm")
    parser.add_argument("--batch-size", type=int, default=64)
    args = parser.parse_args(argv)
    n = export_embeddings(args.captions, args.out, mmm_dir=args.mmm,
                          mmm_name=args.mmm_name, batch_size=args.batch_size)
    print(f"wrote {n} keys to {args.out}")


if __name__ == "__main__":
    main()
