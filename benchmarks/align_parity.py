"""Parity-preserving channel alignment, measured (VERDICT r4 task 2).

The r4 floor closure (docs/FLOOR.md) attributed the headline's 179 ms
step to HBM-streaming GN/normalize fusions and named the misaligned-C
Pallas DMA ceiling (178 vs 657 GB/s at C=192, benchmarks/micro_copy.py)
as the blocker — but channel alignment had only been tried as the
NON-parity tpu128 preset (H11: step time UP 17%). The VERDICT asks for
the untried parity-preserving variant: zero-pad conv channels to lane
multiples (96→128, 192→256) with GroupNorm statistics masked to the
real channels. Zero pads contribute nothing to GN sums, so dividing by
the REAL element count reproduces the unpadded statistics exactly;
pad-channel gammas of 0 zero the pad outputs; downstream convs carry
zero weights on pad channels — bit-exact end to end.

This benchmark measures that formulation head-on at the traffic-
dominant GN sites, against the production baseline (XLA 3-pass at real
C), and verifies the masked-stats exactness claim numerically:

  * xla real C           — what the headline pays today
  * xla padded+masked    — the exact-parity proposal on the XLA path
  * pallas padded+masked — the proposal where alignment actually
                           changes the DMA rate (Pallas single-
                           residency GN at aligned lanes)

The decision arithmetic: padding 96→128 or 192→256 multiplies REAL
traffic by 4/3. XLA's fused reduce already runs the misaligned shapes
at ~689 GB/s ≈ the practical HBM roofline (H17, RESULTS_r4.md §7b), so
the XLA path has no bandwidth to reclaim — alignment can only win if
the aligned Pallas single-residency pass (2 logical passes at 657 GB/s)
beats XLA's 3 passes at 689 GB/s by more than the 4/3 traffic growth:
(2*4/3)/657 vs 3/689 per logical byte. Whatever the verdict, the row
goes into docs/FLOOR.md as a measurement.

Run: cd /root/repo && python -u -m benchmarks.align_parity
"""

from __future__ import annotations

import functools
import json

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffusynth_tpu.ops.group_norm import group_norm_reference

from benchmarks.device_time import device_time_ms

B = 128          # effective CFG batch of the headline step
EPS = 1e-5


def chain_time(op, *args):
    f = jax.jit(op)
    f(*args).block_until_ready()
    return device_time_ms(lambda: f(*args), iters=10) / 1e3


def xla_masked_gn(x, scale, bias, real_c):
    """GroupNorm(1) on a zero-padded (B, hw, C_pad) tensor with stats
    masked to the real channel count: sums are over the padded tensor
    (zero pads contribute nothing), the divisor is the REAL element
    count — reproducing the unpadded statistics exactly."""
    x32 = x.astype(jnp.float32)
    n_real = x.shape[1] * real_c
    s1 = jnp.sum(x32, axis=(1, 2), keepdims=True)
    s2 = jnp.sum(jnp.square(x32), axis=(1, 2), keepdims=True)
    m = s1 / n_real
    var = s2 / n_real - jnp.square(m)
    out = (x32 - m) * jax.lax.rsqrt(var + EPS)
    # scale carries zeros on pad channels -> pad outputs are exactly 0.
    return (out * scale + bias).astype(x.dtype)


def _masked_kernel(x_ref, scale_ref, bias_ref, o_ref, *, real_c, chunk=512):
    x = x_ref[...]
    nb, hw, C = x.shape
    n_real = nb * hw * real_c
    s1 = jnp.float32(0.0)
    s2 = jnp.float32(0.0)
    for i in range(0, hw, chunk):
        c = x[:, i:i + chunk, :].astype(jnp.float32)
        s1 = s1 + jnp.sum(c)
        s2 = s2 + jnp.sum(c * c)
    m = s1 / n_real
    var = s2 / n_real - m * m
    inv = jax.lax.rsqrt(var + EPS)
    scale = scale_ref[0].astype(jnp.float32)
    bias = bias_ref[0].astype(jnp.float32)
    a = (scale * inv).astype(x.dtype)
    b = (bias - m * inv * scale).astype(x.dtype)
    o_ref[...] = x * a + b


def pallas_masked_gn(x, scale, bias, real_c, nb=1):
    Bx, hw, C = x.shape
    return pl.pallas_call(
        functools.partial(_masked_kernel, real_c=real_c),
        grid=(Bx // nb,),
        in_specs=[
            pl.BlockSpec((nb, hw, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, hw, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bx, hw, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, scale.reshape(1, C), bias.reshape(1, C))


def main():
    print("devices:", jax.devices(), flush=True)
    rows = []
    for hw, c_real, c_pad in ((8192, 96, 128), (8192, 192, 256)):
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (B, hw, c_real), dtype=jnp.bfloat16)
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, c_pad - c_real)))
        sc_r = jnp.ones((c_real,), jnp.bfloat16)
        bi_r = jnp.zeros((c_real,), jnp.bfloat16)
        # pad-channel gamma = 0 -> pad outputs exactly 0 (exact parity).
        sc_p = jnp.pad(sc_r, (0, c_pad - c_real))
        bi_p = jnp.pad(bi_r, (0, c_pad - c_real))

        # exactness: masked GN on the padded tensor == GN on the real one
        ref = np.asarray(jax.jit(
            lambda x, s, b: group_norm_reference(x, s, b, EPS)
        )(x, sc_r, bi_r), np.float32)
        got = np.asarray(jax.jit(
            lambda x, s, b: xla_masked_gn(x, s, b, c_real)
        )(xp, sc_p, bi_p), np.float32)[:, :, :c_real]
        err = float(np.abs(ref - got).max())
        got_pl = np.asarray(jax.jit(
            lambda x, s, b: pallas_masked_gn(x, s, b, c_real)
        )(xp, sc_p, bi_p), np.float32)[:, :, :c_real]
        err_pl = float(np.abs(ref - got_pl).max())

        gb_real = 2 * x.size * 2 / 1e9
        t_real = chain_time(
            lambda x, s, b: group_norm_reference(x, s, b, EPS), x, sc_r,
            bi_r)
        t_xpad = chain_time(
            lambda x, s, b: xla_masked_gn(x, s, b, c_real), xp, sc_p, bi_p)
        t_ppad = chain_time(
            lambda x, s, b: pallas_masked_gn(x, s, b, c_real), xp, sc_p,
            bi_p)
        row = {
            "site": f"hw={hw} C={c_real}->{c_pad}",
            "xla_real_ms": round(t_real * 1e3, 3),
            "xla_pad_masked_ms": round(t_xpad * 1e3, 3),
            "pallas_pad_masked_ms": round(t_ppad * 1e3, 3),
            "best_pad_vs_real": round(
                min(t_xpad, t_ppad) / t_real, 3),
            "exact_err_xla": err, "exact_err_pallas": err_pl,
            "xla_real_gbps": round(3 * gb_real / 2 / t_real, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    worst = max(r["best_pad_vs_real"] for r in rows)
    best = min(r["best_pad_vs_real"] for r in rows)
    verdict = ("ALIGNMENT WINS" if worst < 1.0 else
               "ALIGNMENT LOSES (closure row for docs/FLOOR.md)")
    print(f"{verdict}: best padded/real time ratio per site in "
          f"[{best:.3f}, {worst:.3f}] (ratio < 1 would mean padding "
          f"pays for its 4/3 extra traffic)", flush=True)


if __name__ == "__main__":
    main()
