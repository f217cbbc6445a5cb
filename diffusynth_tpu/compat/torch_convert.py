"""torch -> flax weight conversion for the reference's checkpoints.

Enables loading the reference's pretrained .pth files
(models/{name}_{imageVQVAE|UNet|timbre_encoder|MMM}.pth, reference:
VQGAN.py:583, diffusion.py:373, timbre_encoder_pretrain.py:149,
multimodal_model.py:165) into the flax models - the path to the
spectrogram-MAE<1e-3 fidelity target (BASELINE.md).

Flax submodules were named to mirror the torch state_dict keys (see
nn/layers.py), so conversion is a mechanical key translation:

  * "a.b.0.c" merges numeric segments: "a/b_0/c"
  * Residual(PreNorm(attn)) unwraps: ".fn.norm" -> "/norm",
    ".fn.fn.X" -> "/fn/X"
  * leaf transforms: Conv2d (O,I,kh,kw)->(kh,kw,I,O);
    ConvTranspose2d (I,O,kh,kw)->(kh,kw,O,I) with transpose_kernel=True;
    Linear (O,I)->(I,O); norm weight->scale; Embedding -> embedding table.
  * LSTM weight_ih/hh_l{k} split into flax OptimizedLSTMCell's per-gate
    Dense kernels (torch gate order i,f,g,o; torch adds b_ih + b_hh, flax
    keeps the h-side bias only, so biases sum into it).

All converters validate coverage: every flax param must receive a value.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

try:  # torch is only needed when actually converting
    import torch
except ImportError:  # pragma: no cover
    torch = None

import flax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# key translation
# ---------------------------------------------------------------------------

def _merge_numeric_segments(key: str) -> Tuple[str, ...]:
    """"downs.0.1.fn.fn.to_qkv.weight" -> ("downs_0_1","fn","fn","to_qkv","weight")."""
    parts = key.split(".")
    merged = []
    for p in parts:
        if merged and re.fullmatch(r"\d+", p):
            merged[-1] = f"{merged[-1]}_{p}"
        else:
            merged.append(p)
    return tuple(merged)


def _unwrap_residual_prenorm(path: Tuple[str, ...]) -> Tuple[str, ...]:
    """Residual(PreNorm(fn)): torch nests ".fn.norm" and ".fn.fn.X"; the flax
    _Attn module holds "norm" and "fn" directly."""
    out = list(path)
    for i in range(len(out) - 1):
        if out[i] == "fn" and i + 1 < len(out) and out[i + 1] in ("norm", "fn"):
            del out[i]
            break
    return tuple(out)


_LEAF_RENAMES = {
    "weight": None,  # decided by target (kernel/scale/embedding)
    "bias": "bias",
}


def _to_numpy(t) -> np.ndarray:
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def _assign(flat_target: Dict, path: Tuple[str, ...], value: np.ndarray,
            torch_key: str):
    """Place a torch tensor at a flax path, inferring the leaf name and
    transform from the target's shape."""
    *prefix, leaf = path
    candidates = {
        "weight": ["kernel", "scale", "embedding"],
        "bias": ["bias"],
    }[leaf]
    for cand in candidates:
        tgt = tuple(prefix) + (cand,)
        if tgt in flat_target:
            expected = flat_target[tgt].shape
            v = _transform(value, cand, expected, torch_key)
            assert v.shape == tuple(expected), (
                f"{torch_key}: converted {v.shape} != flax {tuple(expected)}"
            )
            flat_target[tgt] = jnp.asarray(v)
            return
    raise KeyError(
        f"{torch_key}: no flax target at {'/'.join(prefix)} "
        f"(tried {candidates})"
    )


def _transform(value: np.ndarray, kind: str, expected, torch_key: str):
    if kind == "scale":
        return value
    if kind == "embedding":
        return value
    if kind == "bias":
        return value
    # kernel: one permutation covers both cases (verified numerically):
    # torch Conv2d (O,I,kh,kw) -> flax (kh,kw,I,O), and torch
    # ConvTranspose2d (I,O,kh,kw) -> flax transpose_kernel=True (kh,kw,O,I).
    if value.ndim == 4:
        return value.transpose(2, 3, 1, 0)
    if value.ndim == 2:
        return value.T  # Linear (O, I) -> (I, O)
    return value


def _convert_generic(state_dict: Dict[str, Any], variables: Dict,
                     collections=("params",),
                     key_filter=None, path_rewrite=None) -> Dict:
    """Shared machinery: translate every torch key and fill the flax tree."""
    out = dict(flax.core.unfreeze(variables))
    flats = {}
    for coll in collections:
        flats[coll] = dict(
            flax.traverse_util.flatten_dict(flax.core.unfreeze(out[coll]))
        )

    unassigned = []
    for torch_key, value in state_dict.items():
        if key_filter and not key_filter(torch_key):
            continue
        path = _merge_numeric_segments(torch_key)
        path = _unwrap_residual_prenorm(path)
        if path_rewrite:
            path = path_rewrite(path)
            if path is None:
                continue
        value = _to_numpy(value)
        placed = False
        for coll in collections:
            try:
                _assign(flats[coll], path, value, torch_key)
                placed = True
                break
            except KeyError:
                continue
        if not placed:
            unassigned.append(torch_key)
    if unassigned:
        raise KeyError(f"unmapped torch keys: {unassigned[:8]}"
                       f"{'...' if len(unassigned) > 8 else ''}")
    for coll in collections:
        out[coll] = flax.traverse_util.unflatten_dict(flats[coll])
    return out


# ---------------------------------------------------------------------------
# per-architecture converters
# ---------------------------------------------------------------------------

def convert_vqgan_state(state_dict: Dict[str, Any], variables: Dict) -> Dict:
    """Reference VQGAN state_dict -> flax variables {"params", "vq"?}."""
    # Quantizer params/buffers don't follow the weight/bias leaf scheme.
    vq_coll = "vq" if "vq" in variables else "params"
    out = dict(flax.core.unfreeze(variables))
    out[vq_coll] = dict(out[vq_coll])
    vq_tree = dict(out[vq_coll].get("_vq_vae", {}))
    quantizer_sd = {}
    rest = {}
    for k, v in state_dict.items():
        if k.startswith("_vq_vae."):
            quantizer_sd[k[len("_vq_vae."):]] = v
        elif ".temb_proj." in k:
            # Dead params: the reference's VQGAN ResnetBlocks always define
            # temb_proj but never receive a time embedding (VQGAN.py:195-197,
            # called without temb at :323-326), so the flax model omits it.
            continue
        else:
            rest[k] = v
    for tk, tv in quantizer_sd.items():
        name = tk[:-len(".weight")] if tk.endswith(".weight") else tk
        assert name in vq_tree, (name, list(vq_tree))
        value = _to_numpy(tv)
        assert value.shape == tuple(vq_tree[name].shape), (name, value.shape)
        vq_tree[name] = jnp.asarray(value)
    out[vq_coll]["_vq_vae"] = vq_tree

    return _convert_generic(rest, out)


def convert_unet_state(state_dict: Dict[str, Any], variables: Dict) -> Dict:
    """Reference ConditionedUnet state_dict -> flax variables."""

    def rewrite(path):
        # label_embedding.embedding.weight -> label_embedding.weight
        if path[0] == "label_embedding" and path[1] == "embedding":
            return ("label_embedding",) + path[2:]
        return path

    return _convert_generic(state_dict, variables, path_rewrite=rewrite)


def convert_timbre_state(state_dict: Dict[str, Any], variables: Dict) -> Dict:
    """Reference TimbreEncoder state_dict -> flax variables.

    The LSTM needs gate splitting: torch packs (i,f,g,o) into one matrix per
    direction; flax OptimizedLSTMCell has per-gate Dense layers (input side
    without bias, hidden side with bias). torch applies b_ih + b_hh, so both
    biases sum into the flax h-side bias.
    """
    flat = dict(flax.traverse_util.flatten_dict(
        flax.core.unfreeze(variables["params"])))

    lstm_keys = {k for k in state_dict if k.startswith("lstm.")}
    plain = {k: v for k, v in state_dict.items() if k not in lstm_keys}
    out = _convert_generic(plain, variables)

    flat = dict(flax.traverse_util.flatten_dict(
        flax.core.unfreeze(out["params"])))
    layers = sorted({int(k.rsplit("l", 1)[1]) for k in lstm_keys})
    gates = ("i", "f", "g", "o")
    for k in layers:
        w_ih = _to_numpy(state_dict[f"lstm.weight_ih_l{k}"])  # (4H, in)
        w_hh = _to_numpy(state_dict[f"lstm.weight_hh_l{k}"])  # (4H, H)
        b_ih = _to_numpy(state_dict[f"lstm.bias_ih_l{k}"])
        b_hh = _to_numpy(state_dict[f"lstm.bias_hh_l{k}"])
        H = w_hh.shape[1]
        for gi, g in enumerate(gates):
            sl = slice(gi * H, (gi + 1) * H)
            assert (f"lstm_{k}", f"i{g}", "kernel") in flat, f"lstm_{k}/i{g}"
            flat[(f"lstm_{k}", f"i{g}", "kernel")] = jnp.asarray(w_ih[sl].T)
            flat[(f"lstm_{k}", f"h{g}", "kernel")] = jnp.asarray(w_hh[sl].T)
            flat[(f"lstm_{k}", f"h{g}", "bias")] = jnp.asarray(
                b_ih[sl] + b_hh[sl])
    out["params"] = flax.traverse_util.unflatten_dict(flat)
    return out


def convert_multimodal_state(state_dict: Dict[str, Any],
                             variables: Dict) -> Dict:
    """Reference multi_modal_model state_dict -> flax variables.

    The torch model embeds the CLAP text tower (text_encoder.*) - those
    weights stay host-side (the text backbone is external by design) and are
    skipped here; timbre_encoder.* routes through the LSTM-aware converter.
    """
    timbre_sd = {
        k[len("timbre_encoder."):]: v for k, v in state_dict.items()
        if k.startswith("timbre_encoder.")
    }
    proj_sd = {
        k: v for k, v in state_dict.items()
        if k.startswith(("text_projection.", "spectrogram_projection."))
    }

    out = dict(flax.core.unfreeze(variables))
    # Projections: "text_projection.layers.0.projection.weight" ->
    # (text_projection, layers_0, projection, kernel)
    out = _convert_generic(proj_sd, out)

    # Timbre tower: reuse the LSTM-aware converter on the subtree.
    sub = {"params": out["params"]["timbre_encoder"]}
    sub = convert_timbre_state(timbre_sd, sub)
    out["params"] = dict(out["params"])
    out["params"]["timbre_encoder"] = sub["params"]
    return out


def load_reference_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference .pth checkpoint's model_state_dict (host-side)."""
    assert torch is not None, "torch is required to load .pth checkpoints"
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return ckpt.get("model_state_dict", ckpt)
