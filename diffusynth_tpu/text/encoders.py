"""Text encoders producing the 512-d condition vectors for the U-Net.

The reference loads laion/clap-htsat-unfused and (by default) projects its
text features through the contrastively-trained multimodal head, running on
CPU (reference: app.py:44-59, multimodal_model.py:114-116). That host-side
placement is parity-faithful: text encoding is tiny next to the diffusion
loop. This module adds:

  * HashTextEncoder - a deterministic seeded stub so the whole framework
    (pipelines, benchmarks, tests) runs with zero network access.
  * CachedTextEncoder - memoizes prompt -> embedding (the reference
    re-encodes the empty prompt once per rendered note,
    track_maker.py:231-233).
"""

from __future__ import annotations

import hashlib
from typing import Callable, Dict, List, Optional, Protocol, Sequence

import numpy as np


class TextEncoder(Protocol):
    feature_dim: int

    def encode(self, prompts: Sequence[str]) -> np.ndarray:
        """(B, feature_dim) float32 text features."""
        ...


class HashTextEncoder:
    """Deterministic per-prompt pseudo-embeddings (sha256 -> seeded normal).

    Not semantically meaningful - a stand-in with the right contract for
    tests/benchmarks and for environments without the CLAP checkpoint.
    """

    def __init__(self, feature_dim: int = 512):
        self.feature_dim = feature_dim

    def encode(self, prompts: Sequence[str]) -> np.ndarray:
        out = np.empty((len(prompts), self.feature_dim), dtype=np.float32)
        for i, p in enumerate(prompts):
            seed = int.from_bytes(
                hashlib.sha256(p.encode("utf-8")).digest()[:8], "little"
            )
            rng = np.random.default_rng(seed)
            v = rng.standard_normal(self.feature_dim).astype(np.float32)
            out[i] = v / np.linalg.norm(v)
        return out


class ClapTextEncoder:
    """laion/clap-htsat-unfused text tower via HF transformers (torch, CPU).

    Requires the checkpoint locally (zero-egress environments must pass
    local_files_only); raises if unavailable - callers fall back to the stub
    via get_text_encoder().
    """

    def __init__(self, model_name: str = "laion/clap-htsat-unfused",
                 local_files_only: bool = True):
        from transformers import AutoTokenizer, ClapModel  # lazy import

        self.model = ClapModel.from_pretrained(
            model_name, local_files_only=local_files_only
        )
        self.tokenizer = AutoTokenizer.from_pretrained(
            model_name, local_files_only=local_files_only
        )
        self.model.eval()
        self.feature_dim = 512

    def encode(self, prompts: Sequence[str]) -> np.ndarray:
        import torch

        with torch.no_grad():
            tokens = self.tokenizer(
                list(prompts), padding=True, return_tensors="pt"
            )
            feats = self.model.get_text_features(**tokens)
        return feats.cpu().numpy().astype(np.float32)


class MultiModalTextEncoder:
    """CLAP (or stub) features projected through the trained multimodal head
    - the production conditioning path (reference: app.py:54-59)."""

    def __init__(self, base: TextEncoder, mmm_apply: Callable[[np.ndarray], np.ndarray],
                 feature_dim: int = 512):
        self.base = base
        self.mmm_apply = mmm_apply
        self.feature_dim = feature_dim

    def encode(self, prompts: Sequence[str]) -> np.ndarray:
        feats = self.base.encode(prompts)
        return np.asarray(self.mmm_apply(feats), dtype=np.float32)


class CachedTextEncoder:
    """Memoizing wrapper (prompt -> embedding)."""

    def __init__(self, base: TextEncoder):
        self.base = base
        self.feature_dim = base.feature_dim
        self._cache: Dict[str, np.ndarray] = {}

    def encode(self, prompts: Sequence[str]) -> np.ndarray:
        missing = [p for p in prompts if p not in self._cache]
        if missing:
            feats = self.base.encode(missing)
            for p, f in zip(missing, feats):
                self._cache[p] = f
        return np.stack([self._cache[p] for p in prompts])


def get_text_encoder(prefer_clap: bool = True, feature_dim: int = 512,
                     mmm_apply: Optional[Callable] = None) -> TextEncoder:
    """CLAP if locally available — the TPU-native flax tower first
    (text/clap_flax.py, converted from the torch checkpoint), then the
    host-side torch path (the reference's own placement, app.py:59) —
    else the deterministic stub. Optionally wrapped with the multimodal
    projection and always cached."""
    base: TextEncoder
    if prefer_clap:
        try:
            from diffusynth_tpu.text.clap_flax import FlaxClapTextEncoder

            base = FlaxClapTextEncoder.from_torch()
        except Exception:
            try:
                base = ClapTextEncoder()
            except Exception:
                base = HashTextEncoder(feature_dim)
    else:
        base = HashTextEncoder(feature_dim)
    if mmm_apply is not None:
        base = MultiModalTextEncoder(base, mmm_apply, feature_dim)
    return CachedTextEncoder(base)
