"""Fused ConvNeXt block body as a single Pallas TPU kernel.

The sampling step is memory-bound: XLA runs the ConvNeXt block body
(reference: diffusion_components.py:107-139 — GN -> conv3x3 -> GELU -> GN ->
conv3x3 -> + residual, after the depthwise 7x7) as ~12 full-activation HBM
passes, ~60% of device time in GroupNorm statistic/normalize traffic
(benchmarks/RESULTS_r1.md). This kernel holds one sample's activations
resident in VMEM and does the whole post-depthwise body with THREE HBM
activation passes: read h, read residual, write y. GroupNorm statistics
become free in-VMEM reductions; the two 3x3 convolutions run as 9 shifted
MXU matmuls over a zero-padded flattened (H*W, C) buffer with width-edge
masks.

The kernel takes `n1`/`n2` — the REAL per-sample element counts of the
two GN sites (H*W*C unless a caller zero-pads channels) — so GroupNorm
statistics are exact.

Differentiable via custom_vjp (backward differentiates the identical
reference formulation); the fused forward is inference-oriented.

Numerics match nn/layers.py::ConvNextBlock in structure: f32 GN statistics,
tanh-approximate GELU, bf16 matmul inputs with f32 accumulation.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


# H15 (GN1-fold-into-conv, measured and DELETED — losing-paths policy):
# GroupNorm(num_groups=1) has per-sample SCALAR stats, so the normalize
# before conv1 is exactly foldable: conv(y, W) = inv * conv(x, W*g) +
# conv(c, W) with c = b - m*inv*g, and conv(c, W) of a spatially-constant
# vector takes only 9 border-class values per (sample, out-channel) — one
# (B, 3, 3, C) conv, edge-replicated. Implemented two ways and measured at
# the headline config (micro_scan, CFG b128, xplane device time):
#   - concat-of-broadcasts expansion: fused 206.8 / int8 192.3 ms/step —
#     XLA materializes the broadcasts as full f32 HBM tensors (+14 ms).
#   - nested-select expansion (fuses into the conv epilogue): fused 193.8
#     / int8 179.3 vs baselines 192.6 / 178.2 — NEUTRAL-to-slightly-worse.
# The normalize passes it removes were already fully overlapped behind the
# conv/dw-conv work (H3's epilogue-fusion finding from the other side);
# the border machinery adds ~1 ms of its own. Exactness was verified to
# 2e-4 f32 before deletion (tests ran in commit history).


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _conv_pf32(x, w, stride: int, pad: int, groups: int):
    """conv_general_dilated with f32-accumulated output AND a working
    gradient. preferred_element_type=f32 over bf16 operands is the faster
    forward (measured 12.5 vs 13.1 s on the batch-64 sampling run) but its
    transpose rule fails under autodiff (f32 cotangent into a bf16 conv);
    the backward therefore differentiates the cast-based formulation."""
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=dn, feature_group_count=groups,
        preferred_element_type=jnp.float32)


def _conv_pf32_ref(x, w, stride: int, pad: int, groups: int):
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=dn, feature_group_count=groups,
    ).astype(jnp.float32)


def _conv_pf32_fwd(x, w, stride, pad, groups):
    return _conv_pf32(x, w, stride, pad, groups), (x, w)


def _conv_pf32_bwd(stride, pad, groups, res, g):
    x, w = res
    _, vjp = jax.vjp(lambda x, w: _conv_pf32_ref(x, w, stride, pad, groups),
                     x, w)
    return vjp(g)


_conv_pf32.defvjp(_conv_pf32_fwd, _conv_pf32_bwd)


def _sum_and_sumsq_bf16(x, chunk: int = 2048):
    """f32 (sum, sumsq) of a 2D bf16 block without a full f32 copy."""
    hw = x.shape[0]
    s1 = jnp.float32(0.0)
    s2 = jnp.float32(0.0)
    for i in range(0, hw, chunk):
        c = x[i:i + chunk, :].astype(jnp.float32)
        s1 = s1 + jnp.sum(c)
        s2 = s2 + jnp.sum(c * c)
    return s1, s2


def _moments(s1, s2, n: int, eps: float):
    m = s1 / n
    var = s2 / n - m * m
    return m, jax.lax.rsqrt(var + eps)


def _convnext_kernel(
    h_ref, t_ref, xres_ref, stats_ref, g1s_ref, g1b_ref, w1_ref, b1_ref,
    g2s_ref, g2b_ref, w2_ref, b2_ref, wres_ref, bres_ref,
    o_ref, ypad_ref, ypad2_ref, *scratch,
    H: int, W: int, P: int, eps: float, norm: bool,
    has_res_conv: bool, n1: int, n2: int, external_stats: bool,
    conv_mode: str = "taps",
):
    """SB batch elements per grid step (SB > 1 measured neutral — the
    sites are FLOP-bound, RESULTS_r2.md): each sample runs GN1(h+t) ->
    conv3x3 -> GELU -> GN2 -> conv3x3 -> + residual with all activations
    VMEM-resident. With external_stats the GN1 sums come from the
    producer instead of an in-VMEM pass."""
    for s in range(h_ref.shape[0]):
        _convnext_one_sample(
            h_ref, t_ref, xres_ref, stats_ref, g1s_ref, g1b_ref, w1_ref,
            b1_ref, g2s_ref, g2b_ref, w2_ref, b2_ref, wres_ref, bres_ref,
            o_ref, ypad_ref, ypad2_ref, *scratch, s=s, H=H, W=W, P=P,
            eps=eps, norm=norm, has_res_conv=has_res_conv, n1=n1, n2=n2,
            external_stats=external_stats, conv_mode=conv_mode)


def _convnext_one_sample(
    h_ref, t_ref, xres_ref, stats_ref, g1s_ref, g1b_ref, w1_ref, b1_ref,
    g2s_ref, g2b_ref, w2_ref, b2_ref, wres_ref, bres_ref,
    o_ref, ypad_ref, ypad2_ref, *scratch,
    s: int, H: int, W: int, P: int, eps: float, norm: bool,
    has_res_conv: bool, n1: int, n2: int, external_stats: bool,
    conv_mode: str = "taps",
):
    HW = H * W
    C = h_ref.shape[-1]
    if conv_mode == "bigmm":
        D = w1_ref.shape[-1] // 9
        acc1_ref, acc2_ref = scratch
    else:
        D = w1_ref.shape[-1]

    x1 = h_ref[s] + jnp.broadcast_to(t_ref[s, 0], (HW, C))  # (HW, C) bf16

    # --- GN1 (stats over the real n1 elements) + normalize.
    if norm:
        if external_stats:
            s1 = stats_ref[s, 0, 0]
            s2 = stats_ref[s, 0, 1]
        else:
            s1, s2 = _sum_and_sumsq_bf16(x1)
        m, inv = _moments(s1, s2, n1, eps)
        g1s = g1s_ref[0].astype(jnp.float32)
        g1b = g1b_ref[0].astype(jnp.float32)
        a = (g1s * inv).astype(x1.dtype)
        b = (g1b - m * inv * g1s).astype(x1.dtype)
        y = x1 * a + b
    else:
        y = x1

    # Zero-padded flat layout: row n = i*W + j; tap (di, dj) reads row
    # n + di*W + dj. Out-of-image rows land in the zero pads; width wrap is
    # masked per-tap.
    ypad_ref[0:P, :] = jnp.zeros((P, C), y.dtype)
    ypad_ref[P + HW:, :] = jnp.zeros((P, C), y.dtype)
    ypad_ref[P:P + HW, :] = y

    j = jax.lax.broadcasted_iota(jnp.int32, (HW, 1), 0) % W
    mask_l = (j > 0).astype(y.dtype)       # tap needs col j-1 >= 0
    mask_r = (j < W - 1).astype(y.dtype)   # tap needs col j+1 <= W-1

    def conv3x3_taps(src_ref, w_ref, bias_ref):
        cin = src_ref.shape[-1]
        cout = w_ref.shape[-1]
        acc = jnp.broadcast_to(
            bias_ref[0].astype(jnp.float32), (HW, cout))
        for tap in range(9):
            di, dj = tap // 3 - 1, tap % 3 - 1
            s = P + di * W + dj
            xs = src_ref[s:s + HW, :]
            if dj < 0:
                xs = xs * mask_l
            elif dj > 0:
                xs = xs * mask_r
            acc = acc + jax.lax.dot_general(
                xs, w_ref[tap * cin:(tap + 1) * cin, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return acc

    mask_l32 = mask_l.astype(jnp.float32)
    mask_r32 = mask_r.astype(jnp.float32)

    def conv3x3_bigmm(src_ref, wcat_ref, bias_ref, acc_ref):
        """ONE uninterrupted (chunked) matmul src @ [w_tap0|...|w_tap8],
        then 9 shifted VMEM adds of the result slices — keeps the MXU busy
        instead of serializing a VPU mask/relayout before each tap."""
        cout = wcat_ref.shape[-1] // 9
        HWp = src_ref.shape[0]
        acc_ref[...] = jnp.broadcast_to(
            bias_ref[0].astype(jnp.float32), (HW, cout))
        Mc = min(2048, HWp)
        for c0 in range(0, HWp, Mc):
            mc = min(Mc, HWp - c0)
            out9 = jax.lax.dot_general(
                src_ref[c0:c0 + mc, :], wcat_ref[...],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (mc, 9*cout)
            for tap in range(9):
                di, dj = tap // 3 - 1, tap % 3 - 1
                s = P + di * W + dj
                n0 = max(0, c0 - s)
                n1_ = min(HW, c0 + mc - s)
                if n1_ <= n0:
                    continue
                r0 = n0 + s - c0
                contrib = out9[r0:r0 + (n1_ - n0),
                               tap * cout:(tap + 1) * cout]
                if dj < 0:
                    contrib = contrib * mask_l32[n0:n1_]
                elif dj > 0:
                    contrib = contrib * mask_r32[n0:n1_]
                acc_ref[n0:n1_, :] += contrib
        return acc_ref[...]

    if conv_mode == "bigmm":
        conv1 = lambda: conv3x3_bigmm(ypad_ref, w1_ref, b1_ref, acc1_ref)  # noqa: E731
        conv2 = lambda: conv3x3_bigmm(ypad2_ref, w2_ref, b2_ref, acc2_ref)  # noqa: E731
    else:
        conv1 = lambda: conv3x3_taps(ypad_ref, w1_ref, b1_ref)  # noqa: E731
        conv2 = lambda: conv3x3_taps(ypad2_ref, w2_ref, b2_ref)  # noqa: E731

    # --- conv1 (C -> D) + GELU (f32) + GN2 + normalize.
    g = jax.nn.gelu(conv1())
    gs1 = jnp.sum(g)
    gs2 = jnp.sum(g * g)
    m2, inv2 = _moments(gs1, gs2, n2, eps)
    g2s = g2s_ref[0].astype(jnp.float32)
    g2b = g2b_ref[0].astype(jnp.float32)
    y2 = ((g - m2) * (inv2 * g2s) + g2b).astype(o_ref.dtype)

    ypad2_ref[0:P, :] = jnp.zeros((P, D), y2.dtype)
    ypad2_ref[P + HW:, :] = jnp.zeros((P, D), y2.dtype)
    ypad2_ref[P:P + HW, :] = y2

    # --- conv2 (D -> Co) + residual.
    acc2 = conv2()
    if has_res_conv:
        res = jax.lax.dot_general(
            xres_ref[s], wres_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bres_ref[0].astype(jnp.float32)
    else:
        res = xres_ref[s].astype(jnp.float32)
    o_ref[s] = (acc2 + res).astype(o_ref.dtype)


def _pallas_forward(h, temb_vec, xres, g1s, g1b, w1, b1, g2s, g2b, w2, b2,
                    wres, bres, stats=None, *, H, W, norm, eps, n1, n2,
                    interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, _, _, C = h.shape
    Cr = xres.shape[-1]
    D = w1.shape[-1]
    Co = w2.shape[-1]
    HW = H * W
    P = _round_up(W + 1, 16)
    has_res_conv = wres is not None
    dtype = h.dtype
    conv_mode = os.environ.get("DIFFUSYNTH_CONV_MODE", "taps")

    h2 = h.reshape(B, HW, C)
    xres2 = xres.reshape(B, HW, Cr)
    if conv_mode == "bigmm":
        # Tap-concatenated layout: (cin, 9*cout).
        w1f = w1.reshape(9, C, D).transpose(1, 0, 2).reshape(
            C, 9 * D).astype(dtype)
        w2f = w2.reshape(9, D, Co).transpose(1, 0, 2).reshape(
            D, 9 * Co).astype(dtype)
    else:
        w1f = w1.reshape(9 * C, D).astype(dtype)
        w2f = w2.reshape(9 * D, Co).astype(dtype)
    if has_res_conv:
        wresf = wres.reshape(Cr, Co).astype(dtype)
        bresf = bres.reshape(1, Co).astype(dtype)
    else:
        wresf = jnp.zeros((8, 128), dtype)   # static-signature placeholders
        bresf = jnp.zeros((1, 128), dtype)

    external_stats = stats is not None
    if external_stats:
        stats_arr = jnp.stack(
            [stats[0].astype(jnp.float32), stats[1].astype(jnp.float32)],
            axis=-1).reshape(B, 1, 2)
        stats_arr = jnp.pad(stats_arr, ((0, 0), (0, 0), (0, 126)))
    else:
        stats_arr = jnp.zeros((B, 1, 128), jnp.float32)
    kern = functools.partial(
        _convnext_kernel, H=H, W=W, P=P, eps=eps, norm=norm,
        has_res_conv=has_res_conv, n1=n1, n2=n2,
        external_stats=external_stats, conv_mode=conv_mode,
    )
    const = lambda b: (0, 0)  # noqa: E731

    # Samples per grid step: largest SB keeping blocks + one sample's
    # f32 temps within ~10 MB of VMEM (measured neutral vs SB=1;
    # RESULTS_r2.md).
    per_sample = HW * (C + Cr + Co) * h.dtype.itemsize
    inter = HW * D * 4 * 2 + 2 * (HW + 2 * P) * (C + D) * h.dtype.itemsize
    SB = 1
    for cand in (16, 8, 4, 2):
        if B % cand == 0 and cand * per_sample + inter <= 10 * 2 ** 20:
            SB = cand
            break

    out = pl.pallas_call(
        kern,
        grid=(B // SB,),
        in_specs=[
            pl.BlockSpec((SB, HW, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SB, 1, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SB, HW, Cr), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SB, 1, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec(w1f.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec(w2f.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Co), const, memory_space=pltpu.VMEM),
            pl.BlockSpec(wresf.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wresf.shape[-1]), const,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((SB, HW, Co), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, HW, Co), dtype),
        scratch_shapes=[
            pltpu.VMEM((HW + 2 * P, C), dtype),
            pltpu.VMEM((HW + 2 * P, D), dtype),
        ] + ([pltpu.VMEM((HW, D), jnp.float32),
              pltpu.VMEM((HW, Co), jnp.float32)]
             if conv_mode == "bigmm" else []),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        h2,
        temb_vec.reshape(B, 1, C).astype(dtype),
        xres2,
        stats_arr,
        g1s.reshape(1, C).astype(dtype), g1b.reshape(1, C).astype(dtype),
        w1f, b1.reshape(1, D).astype(dtype),
        g2s.reshape(1, D).astype(dtype), g2b.reshape(1, D).astype(dtype),
        w2f, b2.reshape(1, Co).astype(dtype),
        wresf, bresf,
    )
    return out.reshape(B, H, W, Co)


def convnext_body_reference(
    h, temb_vec, xres, g1s, g1b, w1, b1, g2s, g2b, w2, b2, wres, bres,
    stats=None, *, norm: bool = True, eps: float = 1e-5,
    n1: Optional[int] = None, n2: Optional[int] = None,
    quantize=None,
):
    """Plain-XLA reference of the same body. n1/n2 are the real element
    counts for the two GN sites (defaults: all elements — the unpadded
    case). stats: optional externally-computed GN1 (sum, sumsq), (B,)
    each. quantize: None | "int8" — run the 3x3 convs whose contraction
    dim is in the measured int8-win regime as dynamic W8A8 int8
    (ops/quant.py)."""
    from diffusynth_tpu.ops.quant import int8_conv, want_int8

    dtype = h.dtype
    B, H, W, C = h.shape
    D = w1.shape[-1]
    Co = w2.shape[-1]
    n1 = n1 if n1 is not None else H * W * C
    n2 = n2 if n2 is not None else H * W * D

    def gn(x, scale, bias, n):
        from diffusynth_tpu.ops.group_norm import stats_input

        # stats_input: keep the stat reduce OUT of the producing conv's
        # epilogue (measured 2x pessimization when fused; RESULTS_r2.md).
        x32 = stats_input(x).astype(jnp.float32)
        s1 = jnp.sum(x32, axis=(1, 2, 3), keepdims=True)
        s2 = jnp.sum(jnp.square(x32), axis=(1, 2, 3), keepdims=True)
        m = s1 / n
        var = s2 / n - jnp.square(m)
        inv = jax.lax.rsqrt(var + eps)
        return (x32 - m) * inv * scale.astype(jnp.float32) + \
            bias.astype(jnp.float32)

    def conv(x, w, stride=1, pad=1, groups=1):
        return _conv_pf32(x.astype(dtype), w.astype(dtype), stride, pad,
                          groups)

    def conv3x3(x, w, k_dim, n_dim):
        if want_int8(quantize, k_dim, n_dim):
            return int8_conv(x.astype(dtype), w.astype(jnp.float32))
        return conv(x, w)

    x1 = h + temb_vec[:, None, None, :].astype(dtype)
    # (H15, the GN1-fold-into-conv1 idea, was measured here and deleted —
    # see the note above _conv_pf32.)
    if norm and stats is not None:
        s1 = stats[0].astype(jnp.float32).reshape(-1, 1, 1, 1)
        s2 = stats[1].astype(jnp.float32).reshape(-1, 1, 1, 1)
        m = s1 / n1
        inv = jax.lax.rsqrt(s2 / n1 - jnp.square(m) + eps)
        y = ((x1.astype(jnp.float32) - m) * inv * g1s.astype(jnp.float32)
             + g1b.astype(jnp.float32)).astype(dtype)
    elif norm:
        y = gn(x1, g1s, g1b, n1).astype(dtype)
    else:
        y = x1
    # NOTE: the f32 materializations of g/acc2 look like avoidable HBM
    # traffic (the profile shows separate convert passes), but forcing
    # bf16 epilogue writes here — the exact change that WON at the
    # attention sites — measured 208.8 vs 194.3 ms/step (bf16) and
    # 181.8 vs 178.2 (int8): XLA already folds these f32 reads into the
    # consumer fusions, and the extra bf16 writes are pure addition
    # (RESULTS_r2.md H9). Keep f32.
    g = jax.nn.gelu(conv3x3(y, w1, C, D) + b1.astype(jnp.float32))
    y2 = gn(g, g2s, g2b, n2).astype(dtype)
    acc2 = conv3x3(y2, w2, D, Co) + b2.astype(jnp.float32)
    if wres is not None:
        res = conv(xres, wres, pad=0) + bres.astype(jnp.float32)
    else:
        res = xres.astype(jnp.float32)
    return (acc2 + res).astype(dtype)


@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(15, 16, 17, 18, 19, 20, 21),
)
def _convnext_body_fused(h, temb_vec, xres, s1, s2, g1s, g1b, w1, b1, g2s,
                         g2b, w2, b2, wres, bres, H, W, norm, eps, n1, n2,
                         external_stats):
    return _pallas_forward(
        h, temb_vec, xres, g1s, g1b, w1, b1, g2s, g2b, w2, b2, wres, bres,
        stats=(s1, s2) if external_stats else None,
        H=H, W=W, norm=norm, eps=eps, n1=n1, n2=n2, interpret=False,
    )


def _fused_fwd(h, temb_vec, xres, s1, s2, g1s, g1b, w1, b1, g2s, g2b,
               w2, b2, wres, bres, H, W, norm, eps, n1, n2, external_stats):
    out = _convnext_body_fused(
        h, temb_vec, xres, s1, s2, g1s, g1b, w1, b1, g2s, g2b, w2, b2,
        wres, bres, H, W, norm, eps, n1, n2, external_stats)
    return out, (h, temb_vec, xres, s1, s2, g1s, g1b, w1, b1, g2s, g2b,
                 w2, b2, wres, bres)


def _fused_bwd(H, W, norm, eps, n1, n2, external_stats, residuals, grad):
    args = residuals
    has_res = args[13] is not None

    def ref(h, t, xr, s1, s2, *rest):
        wres_, bres_ = (rest[8], rest[9]) if has_res else (None, None)
        return convnext_body_reference(
            h, t, xr, *rest[:8], wres_, bres_,
            stats=(s1, s2) if external_stats else None,
            norm=norm, eps=eps, n1=n1, n2=n2)

    n_diff = 15 if has_res else 13
    _, vjp = jax.vjp(ref, *args[:n_diff])
    grads = vjp(grad)
    if not has_res:
        grads = grads + (None, None)
    return grads


_convnext_body_fused.defvjp(_fused_fwd, _fused_bwd)


def convnext_body(
    h, temb_vec, xres, g1s, g1b, w1, b1, g2s, g2b, w2, b2, wres, bres,
    stats=None, *, norm: bool = True, eps: float = 1e-5,
    n1: Optional[int] = None, n2: Optional[int] = None,
    use_pallas: Optional[bool] = None, quantize=None,
):
    """Fused ConvNeXt body with dispatch.

    h (post-depthwise-conv activations), xres (block input / residual):
    (B, H, W, C) / (B, H, W, Cr); temb_vec: (B, C) or None; w1: (3,3,C,D);
    w2: (3,3,D,Co); wres: (1,1,Cr,Co) or None (identity residual, Cr==Co).
    n1/n2: real element counts per sample for the GN sites when channels
    are zero-padded (see module docstring). stats: optional externally
    computed GN1 (sum, sumsq) per sample (then
    temb must already be folded into h). quantize: None | "int8" — W8A8
    int8 for the in-regime 3x3 convs (forces the XLA path for blocks where
    a conv qualifies; the XLA and Pallas paths measure at par in bf16,
    RESULTS_kernel_fusion.md, so the only delta is the int8 win).
    """
    from diffusynth_tpu.ops.quant import want_int8

    B, H, W, C = h.shape
    D = w1.shape[-1]
    Co = w2.shape[-1]
    n1 = n1 if n1 is not None else H * W * C
    n2 = n2 if n2 is not None else H * W * D
    if temb_vec is None:
        temb_vec = jnp.zeros((B, C), h.dtype)
    if want_int8(quantize, C, D) or want_int8(quantize, D, Co):
        use_pallas = False
    # Measurement knob (like DIFFUSYNTH_GN_BARRIER): force the XLA body
    # everywhere while leaving the attention-site kernel dispatch alone —
    # the two share configs.UNetConfig.fused_kernels.
    if os.environ.get("DIFFUSYNTH_BODY_PALLAS") == "0":
        use_pallas = False
    if use_pallas is None:
        # Default OFF everywhere. At b128+ XLA's dw-conv+stats epilogue
        # fusions win at every production shape (H10: 192.6 vs 194.3
        # ms/step; relaxed-%8 Pallas measured 252.8, H7). Inside the
        # batch-8..127 XLA reduce-fusion cliff this kernel DID win 19-34x
        # (22.1 ms at b8 vs 424.5; briefly shipped as an auto gate), but
        # the batch-aware stat barrier in ops/group_norm.stats_input
        # fixes the same cliff INSIDE the XLA body and measures faster
        # still (18.5 ms at b8, 200.9 at b64 vs the kernel's 22.1/204.8)
        # with no VMEM gating — the f32 ups_2_3 site OOMed the kernel's
        # scoped VMEM (119.88 vs 110 MiB). The kernel remains available
        # via use_pallas=True as the measurement reference.
        use_pallas = False
    if use_pallas:
        # Consulted only when the Pallas path would actually be taken, so
        # CPU/auto-off dispatches never emit the fence warning.
        from diffusynth_tpu.ops.dispatch import known_bad_step_batch

        if known_bad_step_batch(B):      # overrides an explicit True
            use_pallas = False
    if use_pallas:
        external = stats is not None
        if external:
            s1, s2 = stats
        else:
            s1 = jnp.zeros((B,), jnp.float32)
            s2 = jnp.zeros((B,), jnp.float32)
        return _convnext_body_fused(
            h, temb_vec, xres, s1, s2, g1s, g1b, w1, b1, g2s, g2b, w2, b2,
            wres, bres, H, W, norm, eps, n1, n2, external)
    return convnext_body_reference(
        h, temb_vec, xres, g1s, g1b, w1, b1, g2s, g2b, w2, b2, wres, bres,
        stats=stats, norm=norm, eps=eps, n1=n1, n2=n2, quantize=quantize)
