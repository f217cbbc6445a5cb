"""Display conversions: spectrograms/phases/latents -> uint8 images.

Mirrors the reference's Gradio conversion utilities
(reference: webUI/natural_language_guided_4/utils.py:8-128, 300-359):
vertically flipped spectrogram images (low frequencies at the bottom),
phase rendered from the cos channel, latent channels tiled side by side.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def spectrogram_to_image(encoded: np.ndarray, channel: int = 0) -> np.ndarray:
    """STFT+ encoding (F, T, 3) -> flipped uint8 grayscale image (F, T)."""
    mag = np.asarray(encoded[..., channel], dtype=np.float32)
    lo, hi = float(mag.min()), float(mag.max())
    norm = (mag - lo) / (hi - lo + 1e-8)
    return np.flipud((norm * 255.0).astype(np.uint8))


def phase_to_image(encoded: np.ndarray) -> np.ndarray:
    """cos-phase channel -> flipped uint8 image."""
    cos = np.asarray(encoded[..., 1], dtype=np.float32)
    return np.flipud(((cos + 1.0) * 127.5).astype(np.uint8))


def latent_to_image(latent: np.ndarray) -> np.ndarray:
    """Latent (H, W, C) -> channels tiled horizontally, uint8."""
    latent = np.asarray(latent, dtype=np.float32)
    chans = [latent[..., c] for c in range(latent.shape[-1])]
    tiled = np.concatenate(chans, axis=1)
    lo, hi = tiled.min(), tiled.max()
    norm = (tiled - lo) / (hi - lo + 1e-8)
    return np.flipud((norm * 255.0).astype(np.uint8))


def resize_image_to_aspect_ratio(
    image: np.ndarray, width_ratio: int = 4, height_ratio: int = 1
) -> np.ndarray:
    """Pad an image to the target aspect ratio (reference:
    utils.py:300-337; keeps content, pads with black)."""
    h, w = image.shape[:2]
    target_w = max(w, int(h * width_ratio / height_ratio))
    target_h = max(h, int(w * height_ratio / width_ratio))
    pad_w = target_w - w
    pad_h = target_h - h
    pads = [(pad_h // 2, pad_h - pad_h // 2), (pad_w // 2, pad_w - pad_w // 2)]
    if image.ndim == 3:
        pads.append((0, 0))
    return np.pad(image, pads)


def feature_map_images(z_e: np.ndarray, z_q: np.ndarray,
                       channel_indices=(0, 3)) -> List[np.ndarray]:
    """Encoder-output vs quantized feature maps as uint8 images, one pair
    per channel (the reference's visualize_feature_maps without matplotlib;
    reference: tools.py:92-123). z_e/z_q: (H, W, C) latents."""
    images = []
    for c in channel_indices:
        for z in (z_e, z_q):
            m = np.asarray(z[..., c], dtype=np.float32)
            lo, hi = m.min(), m.max()
            images.append(((m - lo) / (hi - lo + 1e-8) * 255).astype(np.uint8))
    return images
