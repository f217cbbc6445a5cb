"""TPU-native CLAP text tower (flax) + torch->flax weight conversion.

The reference conditions the U-Net on laion/clap-htsat-unfused text
features computed by HF transformers on the HOST CPU (reference:
app.py:44-59; ClapModel.get_text_features =
text_projection(pooler(text_model(ids))) then L2-normalize). This module
re-implements that text branch as a flax model so text conditioning runs
on the TPU like everything else, with a mechanical converter from the
torch checkpoint. Semantics mirror transformers' modeling_clap.py
(ClapTextModel is the RoBERTa encoder):

  * position ids from input_ids a la fairseq: positions start at
    pad_token_id+1 and padding tokens keep position pad_token_id
    (modeling_clap.create_position_ids_from_input_ids).
  * post-LayerNorm encoder blocks (BertSelfOutput/BertOutput), softmax in
    float32, additive mask bias (1-mask)*finfo.min.
  * pooler = tanh(dense(first token)); projection = linear2(relu(linear1));
    final L2 normalization (ClapModel.get_text_features).
  * exact-erf GELU (torch ACT2FN["gelu"]), NOT the tanh approximation.

Parity vs the in-process torch implementation is pinned by
tests/test_clap_flax.py (random weights; the real checkpoint applies
unchanged when the environment ships it).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class ClapTextTowerConfig:
    """Defaults = transformers.ClapTextConfig (laion/clap-htsat-unfused)."""

    vocab_size: int = 50265
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    pad_token_id: int = 1
    layer_norm_eps: float = 1e-12
    hidden_act: str = "gelu"
    projection_dim: int = 512
    projection_hidden_act: str = "relu"

    @classmethod
    def from_hf(cls, hf_cfg) -> "ClapTextTowerConfig":
        """From a transformers ClapTextConfig."""
        return cls(
            vocab_size=hf_cfg.vocab_size,
            hidden_size=hf_cfg.hidden_size,
            num_hidden_layers=hf_cfg.num_hidden_layers,
            num_attention_heads=hf_cfg.num_attention_heads,
            intermediate_size=hf_cfg.intermediate_size,
            max_position_embeddings=hf_cfg.max_position_embeddings,
            type_vocab_size=hf_cfg.type_vocab_size,
            pad_token_id=hf_cfg.pad_token_id,
            layer_norm_eps=hf_cfg.layer_norm_eps,
            hidden_act=hf_cfg.hidden_act,
            projection_dim=hf_cfg.projection_dim,
            projection_hidden_act=hf_cfg.projection_hidden_act,
        )


def _act(name: str):
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name == "relu":
        return jax.nn.relu
    if name == "gelu_new":
        return lambda x: jax.nn.gelu(x, approximate=True)
    raise ValueError(f"unsupported activation {name!r}")


class _TextLayer(nn.Module):
    """One post-LN encoder block (BertLayer semantics)."""

    cfg: ClapTextTowerConfig

    @nn.compact
    def __call__(self, x, mask_bias):
        c = self.cfg
        B, L, H = x.shape
        nh = c.num_attention_heads
        hd = H // nh

        q = nn.Dense(H, name="query")(x)
        k = nn.Dense(H, name="key")(x)
        v = nn.Dense(H, name="value")(x)

        def split(t):
            return t.reshape(B, L, nh, hd).transpose(0, 2, 1, 3)

        logits = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k))
        logits = logits * (hd ** -0.5) + mask_bias
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), split(v))
        attn = attn.transpose(0, 2, 1, 3).reshape(B, L, H)

        h = nn.Dense(H, name="attn_out")(attn)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="attn_ln")(h + x)

        m = nn.Dense(c.intermediate_size, name="intermediate")(x)
        m = _act(c.hidden_act)(m)
        h = nn.Dense(H, name="out")(m)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="out_ln")(h + x)


class ClapTextTower(nn.Module):
    """input_ids (B, L) int32, attention_mask (B, L) {0,1} ->
    L2-normalized (B, projection_dim) text features."""

    cfg: ClapTextTowerConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        c = self.cfg
        B, L = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((B, L), jnp.int32)

        # fairseq-style position ids: padding keeps position pad_token_id;
        # real tokens count from pad_token_id+1 (position ids depend on
        # input_ids, not attention_mask — matching transformers).
        not_pad = (input_ids != c.pad_token_id).astype(jnp.int32)
        position_ids = jnp.cumsum(not_pad, axis=1) * not_pad + c.pad_token_id

        x = (
            nn.Embed(c.vocab_size, c.hidden_size, name="word_embeddings")(
                input_ids)
            + nn.Embed(c.max_position_embeddings, c.hidden_size,
                       name="position_embeddings")(position_ids)
            + nn.Embed(c.type_vocab_size, c.hidden_size,
                       name="token_type_embeddings")(
                jnp.zeros_like(input_ids))
        )
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="emb_ln")(x)

        mask_bias = ((1.0 - attention_mask.astype(jnp.float32))
                     * jnp.finfo(jnp.float32).min)[:, None, None, :]
        for i in range(c.num_hidden_layers):
            x = _TextLayer(c, name=f"layer_{i}")(x, mask_bias)

        pooled = jnp.tanh(nn.Dense(c.hidden_size, name="pooler")(x[:, 0]))
        f = nn.Dense(c.projection_dim, name="proj1")(pooled)
        f = _act(c.projection_hidden_act)(f)
        f = nn.Dense(c.projection_dim, name="proj2")(f)
        return f / jnp.linalg.norm(f, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# torch -> flax conversion
# ---------------------------------------------------------------------------

def convert_clap_text(state_dict: Dict[str, Any],
                      cfg: ClapTextTowerConfig) -> Dict[str, Any]:
    """Convert a torch CLAP text-branch state_dict to ClapTextTower params.

    Accepts the key layout of ClapTextModelWithProjection / ClapModel
    ("text_model.*" + "text_projection.*"). Validates full coverage of the
    flax tree. Values may be torch tensors or numpy arrays.
    """

    def arr(key):
        t = state_dict[key]
        if hasattr(t, "detach"):
            t = t.detach().cpu().numpy()
        return np.asarray(t, np.float32)

    def dense(prefix):
        return {"kernel": arr(f"{prefix}.weight").T,
                "bias": arr(f"{prefix}.bias")}

    def ln(prefix):
        return {"scale": arr(f"{prefix}.weight"),
                "bias": arr(f"{prefix}.bias")}

    tm = "text_model"
    params: Dict[str, Any] = {
        "word_embeddings": {
            "embedding": arr(f"{tm}.embeddings.word_embeddings.weight")},
        "position_embeddings": {
            "embedding": arr(f"{tm}.embeddings.position_embeddings.weight")},
        "token_type_embeddings": {
            "embedding": arr(
                f"{tm}.embeddings.token_type_embeddings.weight")},
        "emb_ln": ln(f"{tm}.embeddings.LayerNorm"),
        "pooler": dense(f"{tm}.pooler.dense"),
        "proj1": dense("text_projection.linear1"),
        "proj2": dense("text_projection.linear2"),
    }
    for i in range(cfg.num_hidden_layers):
        lp = f"{tm}.encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "query": dense(f"{lp}.attention.self.query"),
            "key": dense(f"{lp}.attention.self.key"),
            "value": dense(f"{lp}.attention.self.value"),
            "attn_out": dense(f"{lp}.attention.output.dense"),
            "attn_ln": ln(f"{lp}.attention.output.LayerNorm"),
            "intermediate": dense(f"{lp}.intermediate.dense"),
            "out": dense(f"{lp}.output.dense"),
            "out_ln": ln(f"{lp}.output.LayerNorm"),
        }

    # Coverage check against a fresh init.
    model = ClapTextTower(cfg)
    ref = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 4), jnp.int32)))["params"]
    ref_paths = {p for p, _ in
                 jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_paths = {p for p, _ in
                 jax.tree_util.tree_flatten_with_path(params)[0]}
    if ref_paths != got_paths:
        missing = ref_paths - got_paths
        extra = got_paths - ref_paths
        raise ValueError(
            f"clap conversion mismatch: missing={missing} extra={extra}")
    shapes_ok = jax.tree_util.tree_map(
        lambda r, g: r.shape == g.shape, ref, params)
    if not all(jax.tree_util.tree_leaves(shapes_ok)):
        bad = [p for p, ok in
               jax.tree_util.tree_flatten_with_path(shapes_ok)[0] if not ok]
        raise ValueError(f"clap conversion shape mismatch at {bad}")
    return params


class FlaxClapTextEncoder:
    """TextEncoder-protocol wrapper: HF tokenizer (host) + flax tower
    (device). feature_dim == projection_dim (512 for the reference)."""

    def __init__(self, tokenizer, params: Dict[str, Any],
                 cfg: ClapTextTowerConfig):
        self.tokenizer = tokenizer
        self.cfg = cfg
        self.feature_dim = cfg.projection_dim
        self._params = params
        model = ClapTextTower(cfg)
        self._apply = jax.jit(
            lambda p, ids, mask: model.apply({"params": p}, ids, mask))

    @classmethod
    def from_torch(cls, model_name: str = "laion/clap-htsat-unfused",
                   local_files_only: bool = True) -> "FlaxClapTextEncoder":
        """Load the HF torch checkpoint and convert. Raises when the
        checkpoint is unavailable (zero-egress) — callers fall back to the
        stub via get_text_encoder()."""
        from transformers import AutoTokenizer, ClapModel

        torch_model = ClapModel.from_pretrained(
            model_name, local_files_only=local_files_only)
        tokenizer = AutoTokenizer.from_pretrained(
            model_name, local_files_only=local_files_only)
        cfg = ClapTextTowerConfig.from_hf(torch_model.config.text_config)
        params = convert_clap_text(torch_model.state_dict(), cfg)
        return cls(tokenizer, params, cfg)

    def encode(self, prompts: Sequence[str]) -> np.ndarray:
        # Bucket the padded length to multiples of 16: each distinct
        # (B, L) is one compiled TPU program, and prompt lengths vary
        # per request. Extra pad tokens are inert (masked bias + fairseq
        # position ids; pinned by test_clap_flax.py::test_padding_is_inert).
        tokens = self.tokenizer(list(prompts), padding=True,
                                pad_to_multiple_of=16, return_tensors="np")
        feats = self._apply(self._params,
                            jnp.asarray(tokens["input_ids"], jnp.int32),
                            jnp.asarray(tokens["attention_mask"], jnp.int32))
        return np.asarray(feats, np.float32)
