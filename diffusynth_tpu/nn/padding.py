"""Channel-lane padding utilities for the Pallas-chain U-Net path.

Pallas block DMA needs lane (channel) dims that are multiples of 128
(benchmarks/micro_copy.py: 178 vs 657 GB/s); the model's real channel
counts are 96/192/384. The hot path therefore runs with activations
zero-padded at rest: every kernel-facing tensor is (B, H, W, Cp) where
Cp = sum of 128-rounded segments, real values living in segment-aligned
lanes and zeros elsewhere. Weights/scale/bias are scattered to match
(zero rows/cols for pad lanes), and GroupNorm statistics count only real
elements — making the padded execution bit-equivalent (up to float
reassociation) to the unpadded model (tests/test_fused_block.py,
tests/test_unet_padded.py).

A layout is a tuple of (real, padded) segments. Single tensors are one
segment; channel-concatenated tensors (U-Net skips) carry one segment per
source, concatenated in order.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp

Segs = Tuple[Tuple[int, int], ...]


def pad128(c: int) -> int:
    return (c + 127) // 128 * 128


def single(real: int) -> Segs:
    return ((real, pad128(real)),)


def total_real(segs: Segs) -> int:
    return sum(r for r, _ in segs)


def total_pad(segs: Segs) -> int:
    return sum(p for _, p in segs)


def concat_segs(a: Segs, b: Segs) -> Segs:
    return tuple(a) + tuple(b)


def scatter_vec(v, segs: Segs, axis: int = -1):
    """Scatter a (..., total_real) vector to (..., total_pad): each
    segment's real values land at its padded offset, zeros elsewhere."""
    axis = axis % v.ndim
    parts = []
    r0 = 0
    for real, padded in segs:
        sl = [slice(None)] * v.ndim
        sl[axis] = slice(r0, r0 + real)
        seg = v[tuple(sl)]
        if padded > real:
            widths = [(0, 0)] * v.ndim
            widths[axis] = (0, padded - real)
            seg = jnp.pad(seg, widths)
        parts.append(seg)
        r0 += real
    assert r0 == v.shape[axis], (r0, v.shape, segs)
    return jnp.concatenate(parts, axis=axis) if len(parts) > 1 else parts[0]


def gather_vec(v, segs: Segs, axis: int = -1):
    """Inverse of scatter_vec: (..., total_pad) -> (..., total_real)."""
    axis = axis % v.ndim
    parts = []
    p0 = 0
    for real, padded in segs:
        sl = [slice(None)] * v.ndim
        sl[axis] = slice(p0, p0 + real)
        parts.append(v[tuple(sl)])
        p0 += padded
    return jnp.concatenate(parts, axis=axis) if len(parts) > 1 else parts[0]


def scatter_rows(w, segs_in: Segs):
    """Scatter a conv/dense kernel's INPUT-channel axis (second to last)
    from total_real to total_pad rows."""
    return scatter_vec(w, segs_in, axis=w.ndim - 2)


def pad_out(w, out_segs: Segs):
    """Zero-pad a kernel's OUTPUT-channel axis (last) to the padded size."""
    return scatter_vec(w, out_segs, axis=w.ndim - 1)


def maybe_pad_input(x, segs: Optional[Segs]):
    """Pad an unpadded (B, H, W, total_real) tensor into the padded layout
    (entry point of the chain)."""
    if segs is None:
        return x
    return scatter_vec(x, segs, axis=-1)
