"""Host-side utilities: amplitude rescaling, label keying, dict merging.

Mirrors reference: tools.py:226-264. rescale/unrescale also accept jnp arrays
(pure elementwise ops).
"""

from __future__ import annotations

from typing import Dict, List, Mapping

import jax.numpy as jnp


def rescale(amp, method: str = "log1p"):
    """Compress amplitudes (reference: tools.py:226-233)."""
    if method == "log1p":
        return jnp.log1p(amp)
    if method == "NormalizedLogisticCompression":
        return amp / (1.0 + amp)
    raise NotImplementedError(method)


def unrescale(scaled_amp, method: str = "NormalizedLogisticCompression"):
    """Inverse of rescale (reference: tools.py:236-243)."""
    if method == "log1p":
        return jnp.expm1(scaled_amp)
    if method == "NormalizedLogisticCompression":
        return scaled_amp / (1.0 - scaled_amp + 1e-10)
    raise NotImplementedError(method)


def create_key(attributes: Mapping) -> str:
    """Deterministic key per NSynth attribute combination.

    Joins samples <-> captions <-> embeddings across the data pipeline
    (reference: tools.py:246-252). Format:
    "{instrument_source_str}_{instrument_family_str}_{qualities bits}".
    """
    qualities_str = "".join(map(str, attributes["qualities"]))
    return (
        f"{attributes['instrument_source_str']}_"
        f"{attributes['instrument_family_str']}_{qualities_str}"
    )


def merge_dictionaries(dicts: List[Dict]) -> Dict:
    """Merge dicts, summing values on key collision (reference: tools.py:255-264)."""
    merged: Dict = {}
    for d in dicts:
        for k, v in d.items():
            if k in merged:
                merged[k] += v
            else:
                merged[k] = v
    return merged


def safe_int(s, default: int = 0) -> int:
    """int() with a fallback (reference: tools.py:154-158)."""
    try:
        return int(s)
    except (ValueError, TypeError):
        return default
