"""Fused U-Net attention site as a single Pallas TPU kernel.

One attention site (reference: diffusion.py:122 et al. + PreNorm/Residual,
diffusion_components.py:142-152, 252-293) is

    y = x + GN_post(W_out @ linear_attention(GN_pre(x) @ W_qkv + label))

XLA materializes every intermediate (normalized x, qkv, softmaxes, context
products, projection, post-norm) in HBM. Here the whole site runs per
sample in VMEM: TWO HBM activation passes (x in, y out) instead of ~10.

The linear attention math matches ops/linear_attention.py::
linear_attention_blocked exactly: feature-axis softmax on q (with the
row-global max as the shared stabilizer — exact, since softmax is invariant
to any per-row constant), sequence-axis softmax on k, full-width (F, F)
context with the cross-head blocks zeroed by an iota mask, so every matmul
is a full 128-lane tile.

`n` gives the real per-sample element count (H*W*C) for both
GroupNorms.

Differentiable via custom_vjp (backward differentiates the reference
formulation).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _moments(s1, s2, n: int, eps: float):
    m = s1 / n
    var = s2 / n - m * m
    return m, jax.lax.rsqrt(var + eps)


def _sum_and_sumsq_bf16(x, chunk: int = 2048):
    hw = x.shape[0]
    s1 = jnp.float32(0.0)
    s2 = jnp.float32(0.0)
    for i in range(0, hw, chunk):
        c = x[i:i + chunk, :].astype(jnp.float32)
        s1 = s1 + jnp.sum(c)
        s2 = s2 + jnp.sum(c * c)
    return s1, s2


def _attn_site_kernel(
    x_ref, lkq_ref, wqkv_ref, wout_ref, bout_ref,
    gpre_s_ref, gpre_b_ref, gpost_s_ref, gpost_b_ref,
    o_ref,
    *, F: int, dim_head: int, scale: float, eps: float, n: int,
):
    """Processes x_ref.shape[0] samples per grid step. (SB > 1 was built
    to amortize per-step launch overhead; measured NEUTRAL — the sites
    are FLOP-bound, RESULTS_r2.md — and kept for the cleaner split.)"""
    for s in range(x_ref.shape[0]):
        _attn_one_sample(
            x_ref, lkq_ref, wqkv_ref, wout_ref, bout_ref, gpre_s_ref,
            gpre_b_ref, gpost_s_ref, gpost_b_ref, o_ref, s,
            F=F, dim_head=dim_head, scale=scale, eps=eps, n=n)


def _attn_one_sample(
    x_ref, lkq_ref, wqkv_ref, wout_ref, bout_ref,
    gpre_s_ref, gpre_b_ref, gpost_s_ref, gpost_b_ref,
    o_ref, s,
    *, F: int, dim_head: int, scale: float, eps: float, n: int,
):
    HW, C = x_ref.shape[-2], x_ref.shape[-1]
    xb = x_ref[s]                                    # (HW, C) bf16

    # --- PreNorm (GN groups=1) over the real n elements.
    s1, s2 = _sum_and_sumsq_bf16(xb)
    m, inv = _moments(s1, s2, n, eps)
    gs = gpre_s_ref[0].astype(jnp.float32)
    gb = gpre_b_ref[0].astype(jnp.float32)
    a = (gs * inv).astype(xb.dtype)
    b = (gb - m * inv * gs).astype(xb.dtype)
    xn = xb * a + b

    # --- qkv projection (1x1 conv, no bias) + label k/q add.
    qkv = jax.lax.dot_general(
        xn, wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (HW, 3F) f32
    lkq = lkq_ref[s, 0].astype(jnp.float32)          # (2F,)
    q = qkv[:, 0:F] + jnp.broadcast_to(lkq[F:2 * F], (HW, F))
    k = qkv[:, F:2 * F] + jnp.broadcast_to(lkq[0:F], (HW, F))
    v = qkv[:, 2 * F:3 * F]

    # --- feature-axis softmax on q per head, shared row-global stabilizer.
    row_max = jnp.max(q, axis=1, keepdims=True)
    eq = jnp.exp(q - row_max)
    # Per-head row sums broadcast across the head's lanes: E @ blockdiag(1).
    lane_r = jax.lax.broadcasted_iota(jnp.int32, (F, F), 0) // dim_head
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (F, F), 1) // dim_head
    head_block = (lane_r == lane_c).astype(jnp.float32)
    seg_sum = jax.lax.dot_general(
        eq, head_block, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qs = eq / seg_sum * scale                        # (HW, F)

    # --- sequence-axis softmax on k (per feature column).
    col_max = jnp.max(k, axis=0, keepdims=True)
    ek = jnp.exp(k - col_max)
    ks = ek / jnp.sum(ek, axis=0, keepdims=True)

    # --- context (F, F), cross-head blocks zeroed; then output.
    ctx = jax.lax.dot_general(
        ks.astype(xb.dtype), v.astype(xb.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * head_block
    attn = jax.lax.dot_general(
        qs.astype(xb.dtype), ctx.astype(xb.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (HW, F)

    out = jax.lax.dot_general(
        attn.astype(xb.dtype), wout_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bout_ref[0].astype(jnp.float32)              # (HW, C)

    # --- post GN (to_out_1) + residual.
    os1 = jnp.sum(out)
    os2 = jnp.sum(out * out)
    m2, inv2 = _moments(os1, os2, n, eps)
    g2s = gpost_s_ref[0].astype(jnp.float32)
    g2b = gpost_b_ref[0].astype(jnp.float32)
    y = (out - m2) * (inv2 * g2s) + g2b
    o_ref[s] = xb + y.astype(xb.dtype)


def _pallas_forward(x, label_kq, wqkv, wout, bout, gpre_s, gpre_b,
                    gpost_s, gpost_b, *, heads, dim_head, scale, eps, n,
                    interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = x.shape
    HW = H * W
    F = heads * dim_head
    dtype = x.dtype
    x2 = x.reshape(B, HW, C)

    # Samples per grid step: largest SB whose x+out blocks plus one
    # sample's f32 intermediates stay within ~10 MB of VMEM (measured
    # neutral vs SB=1 — the sites are FLOP-bound; RESULTS_r2.md).
    per_sample = HW * C * dtype.itemsize * 2          # x block + out block
    inter = HW * (3 * F) * 4 * 2                      # qkv + softmax temps
    SB = 1
    for cand in (16, 8, 4, 2):
        if B % cand == 0 and cand * per_sample + inter <= 10 * 2 ** 20:
            SB = cand
            break

    const = lambda b: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        functools.partial(
            _attn_site_kernel, F=F, dim_head=dim_head, scale=scale,
            eps=eps, n=n),
        grid=(B // SB,),
        in_specs=[
            pl.BlockSpec((SB, HW, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SB, 1, 2 * F), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * F), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((F, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((SB, HW, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, HW, C), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        x2,
        label_kq.reshape(B, 1, 2 * F).astype(dtype),
        wqkv.astype(dtype),
        wout.astype(dtype),
        bout.reshape(1, C).astype(dtype),
        gpre_s.reshape(1, C).astype(dtype),
        gpre_b.reshape(1, C).astype(dtype),
        gpost_s.reshape(1, C).astype(dtype),
        gpost_b.reshape(1, C).astype(dtype),
    )
    return out.reshape(B, H, W, C)


def attention_site_reference(x, label_kq, wqkv, wout, bout, gpre_s, gpre_b,
                             gpost_s, gpost_b, *, heads: int, dim_head: int,
                             scale: float, eps: float = 1e-5,
                             n: Optional[int] = None):
    """Plain-XLA reference: x + GN(W_out @ blocked_linear_attention(
    GN(x) @ W_qkv + label))."""
    from diffusynth_tpu.ops.linear_attention import linear_attention_blocked

    B, H, W, C = x.shape
    HW = H * W
    F = heads * dim_head
    dtype = x.dtype
    n = n if n is not None else HW * C

    def gn(t, scale_v, bias_v):
        from diffusynth_tpu.ops.group_norm import stats_input

        # stats_input: keep the stat reduce out of producer epilogues
        # (measured 2x pessimization when fused; RESULTS_r2.md).
        t32 = stats_input(t).astype(jnp.float32)
        s1 = jnp.sum(t32, axis=(1, 2), keepdims=True)
        s2 = jnp.sum(jnp.square(t32), axis=(1, 2), keepdims=True)
        m = s1 / n
        var = s2 / n - jnp.square(m)
        inv = jax.lax.rsqrt(var + eps)
        return ((t32 - m) * inv * scale_v.astype(jnp.float32)
                + bias_v.astype(jnp.float32))

    x2 = x.reshape(B, HW, C)
    xn = gn(x2, gpre_s, gpre_b).astype(dtype)
    # f32 MXU accumulation, but convert to the working dtype in the conv
    # epilogue: materializing qkv as f32 costs 1.6 GB extra HBM write per
    # L0 site per step (profiled; the label adds below are exact in bf16
    # up to the rounding the attention kernel applies anyway).
    qkv = jnp.einsum("bnc,cf->bnf", xn, wqkv.astype(dtype),
                     preferred_element_type=jnp.float32).astype(dtype)
    q = qkv[..., 0:F] + label_kq[:, None, F:2 * F].astype(dtype)
    k = qkv[..., F:2 * F] + label_kq[:, None, 0:F].astype(dtype)
    v = qkv[..., 2 * F:3 * F]
    attn = linear_attention_blocked(
        q.reshape(B, HW, heads, dim_head),
        k.reshape(B, HW, heads, dim_head),
        v.reshape(B, HW, heads, dim_head),
        scale,
    ).reshape(B, HW, F)
    out = (jnp.einsum("bnf,fc->bnc", attn.astype(dtype), wout.astype(dtype),
                      preferred_element_type=jnp.float32)
           + bout.astype(jnp.float32)).astype(dtype)
    y = gn(out, gpost_s, gpost_b)
    return (x2 + y.astype(dtype)).reshape(B, H, W, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13))
def _attention_site_fused(x, label_kq, wqkv, wout, bout, gpre_s, gpre_b,
                          gpost_s, gpost_b, heads, dim_head, scale, eps, n):
    return _pallas_forward(
        x, label_kq, wqkv, wout, bout, gpre_s, gpre_b, gpost_s, gpost_b,
        heads=heads, dim_head=dim_head, scale=scale, eps=eps, n=n,
        interpret=False)


def _site_fwd(x, label_kq, wqkv, wout, bout, gpre_s, gpre_b, gpost_s,
              gpost_b, heads, dim_head, scale, eps, n):
    out = _attention_site_fused(x, label_kq, wqkv, wout, bout, gpre_s,
                                gpre_b, gpost_s, gpost_b, heads, dim_head,
                                scale, eps, n)
    return out, (x, label_kq, wqkv, wout, bout, gpre_s, gpre_b, gpost_s,
                 gpost_b)


def _site_bwd(heads, dim_head, scale, eps, n, residuals, grad):
    _, vjp = jax.vjp(
        lambda *a: attention_site_reference(
            *a, heads=heads, dim_head=dim_head, scale=scale, eps=eps, n=n),
        *residuals)
    return vjp(grad)


_attention_site_fused.defvjp(_site_fwd, _site_bwd)


def attention_site(x, label_kq, wqkv, wout, bout, gpre_s, gpre_b, gpost_s,
                   gpost_b, *, heads: int = 4, dim_head: int = 32,
                   scale: Optional[float] = None, eps: float = 1e-5,
                   n: Optional[int] = None,
                   use_pallas: Optional[bool] = None):
    """Fused attention site with dispatch.

    x: (B, H, W, C); label_kq: (B, 2F) — concat(label_k, label_q) from the
    condition Dense layers (zeros when unconditioned); wqkv: (C, 3F);
    wout: (F, C); n: real per-sample element count (channel padding).
    """
    B, H, W, C = x.shape
    F = heads * dim_head
    scale = dim_head ** -0.5 if scale is None else scale
    n = n if n is not None else H * W * C
    if use_pallas is None:
        itemsize = jnp.dtype(x.dtype).itemsize
        per_sample = H * W * (2 * C + 6 * F) * itemsize
        # C only needs sublane/VREG granularity (Mosaic lane-pads the
        # misaligned C blocks; DMA penalty measured tolerable vs the XLA
        # path's ~10 HBM materializations). Production dims are
        # 96/192/384 — none are %128 — so requiring C%128 disabled the
        # kernel everywhere it matters.
        use_pallas = (
            jax.default_backend() == "tpu"
            and C % 8 == 0 and F % 128 == 0
            and (H * W) % 128 == 0
            and per_sample <= 64 * 1024 * 1024
        )
    if use_pallas:
        # Consulted only when the Pallas path would actually be taken, so
        # CPU/auto-off dispatches never emit the fence warning.
        from diffusynth_tpu.ops.dispatch import known_bad_step_batch

        if known_bad_step_batch(B):
            # overrides an explicit True: compile-wedge fence
            return attention_site_reference(
                x, label_kq, wqkv, wout, bout, gpre_s, gpre_b, gpost_s,
                gpost_b, heads=heads, dim_head=dim_head, scale=scale,
                eps=eps, n=n)
        # NOTE (H12, RESULTS_r2.md, disproven): zero-padding the C dim to
        # 128 at the site boundary (exact under the real-`n` GroupNorms)
        # to swap the misaligned-lane Pallas DMA rate (~150 GB/s) for the
        # aligned one (~657) measured WORSE in-model: 195.6 vs 194.3
        # ms/step bf16, 181.3 vs 178.2 int8 — the 33% wider x/out blocks
        # plus the pad/slice boundary copies cost more than the rate buys.
        # NOTE (H16, RESULTS_r3.md, disproven): moving the x/out blocks
        # as int8 with per-sample scales (dequant/requant in VMEM; the
        # input quantized by an XLA absmax+round pass) measured WORSE at
        # every production site despite halving the block bytes — bare
        # kernel L0 5.38 vs 4.08 ms, L1 1.24 vs 1.06, L2 0.57 vs 0.47
        # (B=128) — the extra XLA quant passes plus the lower int8 DMA
        # efficiency cost more than the bytes save. Deleted per the
        # losing-paths policy; implementation in git history (r3).
        return _attention_site_fused(
            x, label_kq, wqkv, wout, bout, gpre_s, gpre_b, gpost_s, gpost_b,
            heads, dim_head, scale, eps, n)
    return attention_site_reference(
        x, label_kq, wqkv, wout, bout, gpre_s, gpre_b, gpost_s, gpost_b,
        heads=heads, dim_head=dim_head, scale=scale, eps=eps, n=n)
