"""Dynamic shrinking masks for duration-flexible inpainting.

Port of reference: DiffSynthSampler.py:365-422 to host numpy. Masks vary
only along the latent width axis, so they are stored as (n_steps, W)
profiles and broadcast inside the sampling scan - (n_steps, 1, H, W) tensors
never materialize on device.

Mask semantics: 1.0 = freeze (keep the guide), 0.0 = update (denoise).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


def dynamic_mask_profiles(
    n_masks: int,
    width: int,
    concat_points: Sequence[int],
    train_width: int = 64,
    mask_flexivity: float = 0.8,
) -> np.ndarray:
    """(n_masks, width) float32 stack, ordered as CONSUMED by the loop.

    The reference builds guidance masks that shrink from fully-frozen to
    release-only over n_guidance_steps, then free (release-only) masks; it
    reverses the list and pops from the end, so consumption order equals
    build order - guidance masks first (DiffSynthSampler.py:388-422,499-510).
    The release tail (last train_width/4 columns) is always frozen.
    """
    release = train_width // 4
    assert width == concat_points[-1] + release, (
        "width != concat_points[-1] + release_length"
    )
    fraction_lengths = [
        concat_points[i + 1] - concat_points[i]
        for i in range(len(concat_points) - 1)
    ]
    n_guidance = int(n_masks * mask_flexivity)
    n_free = n_masks - n_guidance

    masks: List[np.ndarray] = []
    for i in range(n_guidance):
        m = np.zeros(width, dtype=np.float32)
        m[-release:] = 1.0
        for fi, flen in enumerate(fraction_lengths):
            if n_guidance > 1:
                mask_len = int((n_guidance - 1 - i) / (n_guidance - 1) * flen)
            else:
                mask_len = 0
            if fi == 0:
                m[:mask_len] = 1.0
            elif fi == len(fraction_lengths) - 1:
                if mask_len != 0:
                    m[-mask_len - release:] = 1.0
            else:
                start = concat_points[fi] + (flen - mask_len) // 2
                m[start:start + mask_len] = 1.0
        masks.append(m)

    for _ in range(n_free):
        m = np.zeros(width, dtype=np.float32)
        m[-release:] = 1.0
        masks.append(m)

    return np.stack(masks) if masks else np.zeros((0, width), dtype=np.float32)
