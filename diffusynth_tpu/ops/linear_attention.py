"""Fused linear cross-attention as Pallas TPU kernels.

The U-Net's attention (reference: diffusion_components.py:171-207,252-293)
is Katharopoulos-style linear attention:

    q' = softmax(q, axis=d) * d^-0.5        (feature-axis softmax)
    k' = softmax(k, axis=N)                 (sequence-axis softmax)
    context[d,e] = sum_n k'[n,d] v[n,e]     (d x d per head)
    out[n,e]     = sum_d context[d,e] q'[n,d]

XLA materializes the softmaxed (B, N, h*d) tensors in HBM between ops; the
Pallas path streams the sequence in VMEM-sized chunks with an ONLINE
(flash-style) column softmax, so k/v/q are each read from HBM exactly once:

  kernel 1 (context): grid (B, N/CH). Scratch m/s hold the running column
      max/sum; the (128, 128) context output block is revisited across
      chunks and rescaled by exp(m_old - m_new) as the max grows; the final
      chunk divides by the column sums.
  kernel 2 (output): grid (B, N/CH). Per-head row softmax of the q chunk
      and a (CH, d) x (d, d) matmul against the context's head-diagonal
      blocks.

`linear_cross_attention` dispatches: Pallas on TPU when shapes qualify,
jnp reference otherwise. Both paths agree to 1e-5 (tests/test_ops.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def linear_attention_jnp(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         scale: float) -> jnp.ndarray:
    """Reference implementation. q, k, v: (B, N, h, d) -> (B, N, h, d)."""
    q = jax.nn.softmax(q, axis=-1) * scale
    k = jax.nn.softmax(k, axis=1)
    context = jnp.einsum("bnhd,bnhe->bhde", k, v)
    return jnp.einsum("bhde,bnhd->bnhe", context, q)


def linear_attention_blocked(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                             scale: float) -> jnp.ndarray:
    """MXU-shaped variant: identical math, full-tile matmuls.

    The per-head einsums produce (d, d) = (32, 32) outputs - 1/16 of an MXU
    tile on both output axes. Instead, contract ALL head features at once:
    (B, N, h*d) x (B, N, h*d) -> (B, h*d, h*d), zero the cross-head blocks
    of the context, and run one more full-width matmul for the output. 4x
    the FLOPs of the per-head version but full 128-lane tiles, which is a
    net win on TPU for h*d == 128 (see tests for numerical equality).
    """
    B, N, h, d = q.shape
    F = h * d
    q = jax.nn.softmax(q, axis=-1) * scale
    k = jax.nn.softmax(k, axis=1)
    qf = q.reshape(B, N, F)
    kf = k.reshape(B, N, F)
    vf = v.reshape(B, N, F)

    ctx = jnp.einsum("bnf,bng->bfg", kf, vf,
                     preferred_element_type=jnp.float32)
    # Zero cross-head blocks: block-diagonal mask (host constant).
    blocks = np.kron(np.eye(h), np.ones((d, d))).astype(np.float32)
    ctx = ctx * jnp.asarray(blocks)
    out = jnp.einsum("bnf,bfg->bng", qf, ctx.astype(qf.dtype),
                     preferred_element_type=jnp.float32)
    return out.reshape(B, N, h, d).astype(q.dtype)


def _context_kernel(k_ref, v_ref, ctx_ref, m_ref, s_ref, *, n_chunks: int):
    """Online column-softmax context accumulation (one (b, chunk) cell)."""
    import jax.experimental.pallas as pl

    chunk_idx = pl.program_id(1)

    k = k_ref[0].astype(jnp.float32)   # (CH, F)
    v = v_ref[0].astype(jnp.float32)   # (CH, F)

    @pl.when(chunk_idx == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        s_ref[:] = jnp.zeros_like(s_ref)
        ctx_ref[:] = jnp.zeros_like(ctx_ref)

    m_old = m_ref[:]                            # (1, F)
    cm = jnp.max(k, axis=0, keepdims=True)      # (1, F)
    m_new = jnp.maximum(m_old, cm)
    rescale = jnp.exp(m_old - m_new)            # (1, F)
    e = jnp.exp(k - m_new)                      # (CH, F)

    m_ref[:] = m_new
    s_ref[:] = s_ref[:] * rescale + jnp.sum(e, axis=0, keepdims=True)
    # Context rows are indexed by the k-feature axis -> rescale rows.
    ctx = ctx_ref[0] * rescale.reshape(-1, 1)
    ctx = ctx + jax.lax.dot_general(
        e, v, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )

    @pl.when(chunk_idx == n_chunks - 1)
    def _():
        ctx_ref[0] = ctx / s_ref[:].reshape(-1, 1)

    @pl.when(chunk_idx < n_chunks - 1)
    def _():
        ctx_ref[0] = ctx


def _output_kernel(q_ref, ctx_ref, out_ref, *, heads: int, dim_head: int,
                   scale: float):
    """Per-head q row-softmax + contraction against the context blocks."""
    q = q_ref[0].astype(jnp.float32)        # (CH, F)
    ctx = ctx_ref[0]                        # (F, F); head-diagonal blocks used
    for h in range(heads):
        sl = slice(h * dim_head, (h + 1) * dim_head)
        qh = q[:, sl]
        qh_max = jnp.max(qh, axis=1, keepdims=True)
        qh_exp = jnp.exp(qh - qh_max)
        qh_sm = qh_exp / jnp.sum(qh_exp, axis=1, keepdims=True) * scale
        out_ref[0, :, sl] = jnp.dot(
            qh_sm, ctx[sl, sl], preferred_element_type=jnp.float32
        ).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("heads", "dim_head", "scale", "chunk")
)
def linear_attention_pallas(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                            heads: int, dim_head: int, scale: float,
                            chunk: int = 1024) -> jnp.ndarray:
    """Fused streaming kernel. q, k, v: (B, N, heads * dim_head)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N, F = q.shape
    assert F == heads * dim_head
    CH = min(chunk, N)
    assert N % CH == 0, (N, CH)
    n_chunks = N // CH

    ctx = pl.pallas_call(
        functools.partial(_context_kernel, n_chunks=n_chunks),
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec((1, CH, F), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CH, F), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, F, F), lambda b, c: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, F, F), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, F), jnp.float32),   # running max
            pltpu.VMEM((1, F), jnp.float32),   # running sum
        ],
    )(k, v)

    out = pl.pallas_call(
        functools.partial(_output_kernel, heads=heads, dim_head=dim_head,
                          scale=scale),
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec((1, CH, F), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F, F), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, CH, F), lambda b, c: (b, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, F), q.dtype),
    )(q, ctx)
    return out


def linear_cross_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, heads: int,
    dim_head: int, scale: float, use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Dispatch: (B, N, h, d) in/out.

    Default: the MXU-shaped blocked formulation when h*d is a multiple of
    the 128-lane tile (identical numerics, full-tile matmuls), the per-head
    einsum otherwise. use_pallas=True selects the fused streaming kernel -
    measured ~par with XLA standalone (9.8 vs 8.8 ms at B=128 N=8192), so
    it stays opt-in.
    """
    B, N, h, d = q.shape
    if use_pallas is None:
        use_pallas = False
    if use_pallas and not (
        h * d % 128 == 0 and (N % 1024 == 0 or (N <= 1024 and N % 128 == 0))
    ):
        use_pallas = False
    if use_pallas:
        q2 = q.reshape(B, N, h * d)
        k2 = k.reshape(B, N, h * d)
        v2 = v.reshape(B, N, h * d)
        out = linear_attention_pallas(q2, k2, v2, heads, dim_head, scale)
        return out.reshape(B, N, h, d)
    if (h * d) % 128 == 0:
        return linear_attention_blocked(q, k, v, scale)
    return linear_attention_jnp(q, k, v, scale)
