"""Fused ConvNeXt-block and attention-site Pallas kernels vs references.

Runs the kernels in interpret mode on CPU; TPU perf and numerics are
covered by benchmarks/micro_convnext.py on hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusynth_tpu.ops.fused_block import (
    _pallas_forward as convnext_pallas,
    convnext_body_reference,
)
from diffusynth_tpu.ops.attention_site import (
    _pallas_forward as attn_pallas,
    attention_site_reference,
)


def _convnext_args(key, B=2, H=16, W=8, C=128, D=192, Co=128):
    ks = jax.random.split(key, 12)
    return dict(
        h=jax.random.normal(ks[0], (B, H, W, C), jnp.float32),
        t=jax.random.normal(ks[1], (B, C), jnp.float32) * 0.1,
        xres=jax.random.normal(ks[2], (B, H, W, C), jnp.float32),
        g1s=jax.random.normal(ks[3], (C,)) * 0.2 + 1.0,
        g1b=jax.random.normal(ks[4], (C,)) * 0.1,
        w1=jax.random.normal(ks[5], (3, 3, C, D)) * 0.05,
        b1=jax.random.normal(ks[6], (D,)) * 0.1,
        g2s=jax.random.normal(ks[7], (D,)) * 0.2 + 1.0,
        g2b=jax.random.normal(ks[8], (D,)) * 0.1,
        w2=jax.random.normal(ks[9], (3, 3, D, Co)) * 0.05,
        b2=jax.random.normal(ks[10], (Co,)) * 0.1,
    ), ks[11]


class TestConvNextKernel:
    def test_identity_residual(self):
        a, _ = _convnext_args(jax.random.PRNGKey(0))
        args = list(a.values()) + [None, None]
        ref = convnext_body_reference(*args)
        got = convnext_pallas(*args, H=16, W=8, norm=True, eps=1e-5,
                              n1=16 * 8 * 128, n2=16 * 8 * 192,
                              interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=5e-5, rtol=1e-4)

    def test_conv_residual_and_no_norm(self):
        a, k = _convnext_args(jax.random.PRNGKey(1))
        wres = jax.random.normal(k, (1, 1, 128, 128)) * 0.05
        bres = jnp.full((128,), 0.05)
        args = list(a.values()) + [wres, bres]
        for norm in (True, False):
            ref = convnext_body_reference(*args, norm=norm)
            got = convnext_pallas(*args, H=16, W=8, norm=norm, eps=1e-5,
                                  n1=16 * 8 * 128, n2=16 * 8 * 192,
                                  interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=5e-5, rtol=1e-4)

    def test_padded_channels_match_real(self):
        """Zero-padded channel lanes + real-n GN == the real-dims body."""
        a, _ = _convnext_args(jax.random.PRNGKey(2))
        Cr, Dr = 96, 160   # real sizes inside the 128/192 padded arrays
        ap = dict(a)
        for name, ax in [("h", -1), ("t", -1), ("xres", -1), ("g1s", 0),
                         ("g1b", 0)]:
            ap[name] = ap[name].at[..., Cr:].set(0.0) if ax == -1 else ap[name]
        ap["g1s"] = ap["g1s"].at[Cr:].set(0.0)
        ap["g1b"] = ap["g1b"].at[Cr:].set(0.0)
        ap["w1"] = ap["w1"].at[:, :, Cr:, :].set(0.0).at[:, :, :, Dr:].set(0.0)
        ap["b1"] = ap["b1"].at[Dr:].set(0.0)
        ap["g2s"] = ap["g2s"].at[Dr:].set(0.0)
        ap["g2b"] = ap["g2b"].at[Dr:].set(0.0)
        ap["w2"] = ap["w2"].at[:, :, Dr:, :].set(0.0).at[:, :, :, Cr:].set(0.0)
        ap["b2"] = ap["b2"].at[Cr:].set(0.0)

        ref = convnext_body_reference(
            ap["h"][..., :Cr], ap["t"][:, :Cr], ap["xres"][..., :Cr],
            ap["g1s"][:Cr], ap["g1b"][:Cr], ap["w1"][:, :, :Cr, :Dr],
            ap["b1"][:Dr], ap["g2s"][:Dr], ap["g2b"][:Dr],
            ap["w2"][:, :, :Dr, :Cr], ap["b2"][:Cr], None, None)
        got = convnext_pallas(*(list(ap.values()) + [None, None]),
                              H=16, W=8, norm=True, eps=1e-5,
                              n1=16 * 8 * Cr, n2=16 * 8 * Dr,
                              interpret=True)
        np.testing.assert_allclose(np.asarray(got[..., :Cr]),
                                   np.asarray(ref), atol=5e-5, rtol=1e-4)
        assert np.all(np.asarray(got[..., Cr:]) == 0.0)

    def test_gradients_flow(self):
        """custom_vjp backward (reference-based) is wired for training."""
        from diffusynth_tpu.ops.fused_block import convnext_body

        a, _ = _convnext_args(jax.random.PRNGKey(3), B=1, H=8, W=8,
                              C=16, D=24, Co=16)

        def loss(w1):
            out = convnext_body(
                a["h"], a["t"], a["xres"], a["g1s"], a["g1b"], w1, a["b1"],
                a["g2s"], a["g2b"], a["w2"], a["b2"], None, None,
                use_pallas=False)
            return jnp.sum(out ** 2)

        g = jax.grad(loss)(a["w1"])
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0


class TestAttentionSiteKernel:
    def _args(self, key, B=2, H=16, W=8, C=128, F=128):
        ks = jax.random.split(key, 8)
        return dict(
            x=jax.random.normal(ks[0], (B, H, W, C), jnp.float32),
            label_kq=jax.random.normal(ks[1], (B, 2 * F)) * 0.3,
            wqkv=jax.random.normal(ks[2], (C, 3 * F)) * 0.05,
            wout=jax.random.normal(ks[3], (F, C)) * 0.05,
            bout=jax.random.normal(ks[4], (C,)) * 0.1,
            gpre_s=jax.random.normal(ks[5], (C,)) * 0.2 + 1.0,
            gpre_b=jnp.zeros((C,)),
            gpost_s=jax.random.normal(ks[6], (C,)) * 0.2 + 1.0,
            gpost_b=jax.random.normal(ks[7], (C,)) * 0.1,
        )

    @pytest.mark.parametrize("conditioned", [True, False])
    def test_matches_reference(self, conditioned):
        a = self._args(jax.random.PRNGKey(0))
        if not conditioned:
            a["label_kq"] = jnp.zeros_like(a["label_kq"])
        kw = dict(heads=4, dim_head=32, scale=32 ** -0.5, eps=1e-5,
                  n=16 * 8 * 128)
        ref = attention_site_reference(*a.values(), **kw)
        got = attn_pallas(*a.values(), **kw, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=5e-5, rtol=1e-4)

    @pytest.mark.parametrize("C", [96, 192])
    def test_non_lane_aligned_channels(self, C):
        """Production dims (96/192/384) are not %128; the kernel must
        handle a lane-misaligned C directly (dispatch gate is C%8)."""
        a = self._args(jax.random.PRNGKey(5), C=C)
        kw = dict(heads=4, dim_head=32, scale=32 ** -0.5, eps=1e-5,
                  n=16 * 8 * C)
        ref = attention_site_reference(*a.values(), **kw)
        got = attn_pallas(*a.values(), **kw, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=5e-5, rtol=1e-4)

    def test_padded_channels_match_real(self):
        a = self._args(jax.random.PRNGKey(1))
        Cr = 96
        a["x"] = a["x"].at[..., Cr:].set(0.0)
        a["wqkv"] = a["wqkv"].at[Cr:, :].set(0.0)
        a["wout"] = a["wout"].at[:, Cr:].set(0.0)
        for nm in ("bout", "gpre_s", "gpre_b", "gpost_s", "gpost_b"):
            a[nm] = a[nm].at[Cr:].set(0.0)
        kw = dict(heads=4, dim_head=32, scale=32 ** -0.5, eps=1e-5,
                  n=16 * 8 * Cr)
        ref = attention_site_reference(
            a["x"][..., :Cr], a["label_kq"], a["wqkv"][:Cr], a["wout"][:, :Cr],
            a["bout"][:Cr], a["gpre_s"][:Cr], a["gpre_b"][:Cr],
            a["gpost_s"][:Cr], a["gpost_b"][:Cr], **kw)
        got = attn_pallas(*a.values(), **kw, interpret=True)
        np.testing.assert_allclose(np.asarray(got[..., :Cr]),
                                   np.asarray(ref), atol=5e-5, rtol=1e-4)
        assert np.all(np.asarray(got[..., Cr:]) == 0.0)

    def test_reference_matches_module_path(self):
        """attention_site_reference == PreNorm + LinearCrossAttentionAdd
        + residual (the pre-fusion module math)."""
        import flax.linen as nn

        from diffusynth_tpu.nn.layers import LinearCrossAttentionAdd
        from diffusynth_tpu.ops.group_norm import group_norm_reference

        a = self._args(jax.random.PRNGKey(2))
        B, H, W, C = a["x"].shape
        F = 128
        cond = jax.random.normal(jax.random.PRNGKey(3), (B, 64))

        mod = LinearCrossAttentionAdd()
        variables = mod.init(jax.random.PRNGKey(4), a["x"], cond)
        p = variables["params"]
        # Overwrite with the test weights for an exact comparison.
        p = jax.tree_util.tree_map(lambda v: v, p)
        p["to_qkv"]["kernel"] = a["wqkv"].reshape(1, 1, C, 3 * F)
        p["to_out_0"]["kernel"] = a["wout"].reshape(1, 1, F, C)
        p["to_out_0"]["bias"] = a["bout"]
        p["to_out_1"]["scale"] = a["gpost_s"]
        p["to_out_1"]["bias"] = a["gpost_b"]

        xn = group_norm_reference(a["x"], a["gpre_s"], a["gpre_b"], 1e-5)
        module_out = mod.apply({"params": p}, xn, cond) + a["x"]

        lk = cond @ p["label_key"]["kernel"] + p["label_key"]["bias"]
        lq = cond @ p["label_query"]["kernel"] + p["label_query"]["bias"]
        ref = attention_site_reference(
            a["x"], jnp.concatenate([lk, lq], axis=-1), a["wqkv"], a["wout"],
            a["bout"], a["gpre_s"], a["gpre_b"], a["gpost_s"], a["gpost_b"],
            heads=4, dim_head=32, scale=32 ** -0.5, eps=1e-5, n=H * W * C)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(module_out),
                                   atol=5e-5, rtol=1e-4)


class TestExternalStats:
    def test_kernel_external_stats_matches_internal(self):
        a, _ = _convnext_args(jax.random.PRNGKey(4))
        h, t = a["h"], a["t"]
        x1 = h + t[:, None, None, :]
        s1 = jnp.sum(x1, axis=(1, 2, 3))
        s2 = jnp.sum(jnp.square(x1), axis=(1, 2, 3))
        args = list(a.values()) + [None, None]
        internal = convnext_pallas(*args, H=16, W=8, norm=True, eps=1e-5,
                                   n1=16 * 8 * 128, n2=16 * 8 * 192,
                                   interpret=True)
        external = convnext_pallas(*args, stats=(s1, s2), H=16, W=8,
                                   norm=True, eps=1e-5, n1=16 * 8 * 128,
                                   n2=16 * 8 * 192, interpret=True)
        np.testing.assert_allclose(np.asarray(external),
                                   np.asarray(internal),
                                   atol=5e-5, rtol=1e-4)

    def test_body_dispatch_with_stats_reference(self):
        """convnext_body(stats=...) on the reference path (CPU) matches the
        stats-free call when stats are the true sums."""
        from diffusynth_tpu.ops.fused_block import convnext_body

        a, _ = _convnext_args(jax.random.PRNGKey(5))
        h, t = a["h"], a["t"]
        x1 = h + t[:, None, None, :]
        s1 = jnp.sum(x1, axis=(1, 2, 3))
        s2 = jnp.sum(jnp.square(x1), axis=(1, 2, 3))
        base = convnext_body(*list(a.values()), None, None,
                             use_pallas=False)
        # external stats path: temb already folded into h
        ext = convnext_body(x1, None, a["xres"], a["g1s"], a["g1b"],
                            a["w1"], a["b1"], a["g2s"], a["g2b"], a["w2"],
                            a["b2"], None, None, stats=(s1, s2),
                            use_pallas=False)
        np.testing.assert_allclose(np.asarray(ext), np.asarray(base),
                                   atol=5e-5, rtol=1e-4)


class TestTrainingDtypes:
    def test_grad_through_reference_bf16(self):
        """Regression: bf16 activations + f32 params must differentiate
        (the TPU custom_vjp backward runs the reference body with exactly
        this dtype mix; lax.conv with preferred_element_type=f32 breaks
        its transpose rule there)."""
        a, k = _convnext_args(jax.random.PRNGKey(11), B=1, H=8, W=8,
                              C=16, D=24, Co=16)
        h16 = a["h"].astype(jnp.bfloat16)
        x16 = a["xres"].astype(jnp.bfloat16)
        t16 = a["t"].astype(jnp.bfloat16)
        wres = jax.random.normal(k, (1, 1, 16, 16)) * 0.05
        bres = jnp.zeros((16,))

        def loss(w1):
            out = convnext_body_reference(
                h16, t16, x16, a["g1s"], a["g1b"], w1, a["b1"], a["g2s"],
                a["g2b"], a["w2"], a["b2"], wres, bres)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        g = jax.grad(loss)(a["w1"])
        assert np.isfinite(np.asarray(g, np.float32)).all()

    def test_fused_bwd_wrapper_mixed_dtypes(self):
        """The custom_vjp bwd path itself, with interpret-mode forward."""
        from diffusynth_tpu.ops.fused_block import _fused_bwd

        a, _ = _convnext_args(jax.random.PRNGKey(12), B=1, H=8, W=8,
                              C=16, D=24, Co=16)
        h16 = a["h"].astype(jnp.bfloat16)
        residuals = (h16, a["t"].astype(jnp.bfloat16),
                     a["xres"].astype(jnp.bfloat16),
                     jnp.zeros((1,)), jnp.zeros((1,)),
                     a["g1s"], a["g1b"], a["w1"], a["b1"], a["g2s"],
                     a["g2b"], a["w2"], a["b2"], None, None)
        grad = jnp.ones((1, 8, 8, 16), jnp.bfloat16)
        grads = _fused_bwd(8, 8, True, 1e-5, 8 * 8 * 16, 8 * 8 * 24, False,
                           residuals, grad)
        assert len(grads) == 15
        assert np.isfinite(np.asarray(grads[7], np.float32)).all()  # w1


class TestStepBatchFence:
    """DIFFUSYNTH_BAD_STEP_BATCHES fences Mosaic kernel dispatch at batch
    dims whose step-program compile is known to wedge the remote compiler
    (docs/SCAN_FAULT.md 2026-08-17 appendix). The fence must override an
    explicit use_pallas=True — on CPU the Pallas path would raise, so a
    clean reference-matching result proves the fallback happened."""

    def test_predicate(self, monkeypatch):
        from diffusynth_tpu.ops import dispatch

        # Default denylist is EMPTY since r4: two fresh compiles of the
        # 2026-08-17 wedge signature ran clean after a backend update
        # (docs/SCAN_FAULT.md round-4 entry). The default must track the
        # measured backend state, not a stale workaround.
        monkeypatch.delenv("DIFFUSYNTH_BAD_STEP_BATCHES", raising=False)
        assert not dispatch.known_bad_step_batch(64)
        assert not dispatch.known_bad_step_batch(128)
        assert not dispatch.known_bad_step_batch(96)
        # Explicit clear for operators on a fixed backend.
        monkeypatch.setenv("DIFFUSYNTH_BAD_STEP_BATCHES", "none")
        assert not dispatch.known_bad_step_batch(64)
        monkeypatch.setenv("DIFFUSYNTH_BAD_STEP_BATCHES", "")
        assert not dispatch.known_bad_step_batch(64)
        # Explicit list replaces the default entirely.
        monkeypatch.setenv("DIFFUSYNTH_BAD_STEP_BATCHES", "64,96")
        assert dispatch.known_bad_step_batch(64)
        assert dispatch.known_bad_step_batch(96)
        assert not dispatch.known_bad_step_batch(128)
        monkeypatch.setenv("DIFFUSYNTH_BAD_STEP_BATCHES", "not-an-int")
        with pytest.warns(UserWarning, match="comma-separated"):
            assert not dispatch.known_bad_step_batch(64)

    def test_attention_site_fenced(self, monkeypatch):
        from diffusynth_tpu.ops.attention_site import attention_site

        monkeypatch.setenv("DIFFUSYNTH_BAD_STEP_BATCHES", "2")
        a = TestAttentionSiteKernel()._args(jax.random.PRNGKey(7), B=2)
        kw = dict(heads=4, dim_head=32, eps=1e-5, n=16 * 8 * 128)
        got = attention_site(*a.values(), **kw, use_pallas=True)
        ref = attention_site_reference(*a.values(), scale=32 ** -0.5, **kw)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6, rtol=1e-6)

    def test_convnext_body_fenced(self, monkeypatch):
        from diffusynth_tpu.ops.fused_block import convnext_body

        monkeypatch.setenv("DIFFUSYNTH_BAD_STEP_BATCHES", "2")
        a, _ = _convnext_args(jax.random.PRNGKey(8))
        args = list(a.values()) + [None, None]
        got = convnext_body(*args, use_pallas=True)
        ref = convnext_body_reference(*args)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6, rtol=1e-6)

    def test_other_batches_unfenced(self, monkeypatch):
        from diffusynth_tpu.ops import dispatch
        from diffusynth_tpu.ops.attention_site import attention_site

        monkeypatch.setenv("DIFFUSYNTH_BAD_STEP_BATCHES", "64")
        # B=2 is not in the denylist: auto dispatch (CPU -> reference).
        a = TestAttentionSiteKernel()._args(jax.random.PRNGKey(9), B=2)
        kw = dict(heads=4, dim_head=32, eps=1e-5, n=16 * 8 * 128)
        got = attention_site(*a.values(), **kw)
        assert np.isfinite(np.asarray(got)).all()
        assert not dispatch.known_bad_step_batch(2)


class TestStatsBarrierPolicy:
    """ops/group_norm.stats_input: the batch-aware stat barrier that
    fixes the XLA batch-8..127 reduce-fusion cliff (RESULTS_r2.md: the
    whole U-Net forward at b8 measured 424.5 ms with the per-sample GN
    stat reduce fused into conv producer epilogues, 18.5 ms with the
    stats behind an optimization barrier). The barrier must fire ONLY
    inside the cliff batch range on TPU — at b128 it measured WORSE
    (266.5 vs 239.9 ms/step, H3)."""

    @staticmethod
    def _has_barrier(x):
        from diffusynth_tpu.ops.group_norm import stats_input

        # Fresh wrapper per call: jax's tracing cache keys on the
        # function object, and stats_input's barrier decision is made in
        # python at trace time — a cached jaxpr would leak the previous
        # test's backend/env into this one.
        jaxpr = jax.make_jaxpr(lambda y: stats_input(y))(x)
        return any(e.primitive.name == "optimization_barrier"
                   for e in jaxpr.eqns)

    def test_cliff_batches_barriered_on_tpu(self, monkeypatch):
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        for B in (8, 16, 64, 127):
            assert self._has_barrier(jnp.zeros((B, 4, 4, 96))), B

    def test_outside_cliff_passthrough(self, monkeypatch):
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        for B in (1, 2, 4, 7, 128, 256):
            assert not self._has_barrier(jnp.zeros((B, 4, 4, 96))), B

    def test_cpu_passthrough(self):
        assert not self._has_barrier(jnp.zeros((8, 4, 4, 96)))

    def test_env_force_overrides(self, monkeypatch):
        monkeypatch.setenv("DIFFUSYNTH_GN_BARRIER", "1")
        assert self._has_barrier(jnp.zeros((2, 4, 4, 96)))
        monkeypatch.setenv("DIFFUSYNTH_GN_BARRIER", "0")
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        assert not self._has_barrier(jnp.zeros((8, 4, 4, 96)))

    def test_barrier_is_numerically_inert(self, monkeypatch):
        """The barriered GN must equal the unbarriered GN exactly."""
        from diffusynth_tpu.ops.group_norm import group_norm_reference

        x = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 4, 96))
        s = jnp.linspace(0.5, 1.5, 96)
        b = jnp.linspace(-0.1, 0.1, 96)
        base = group_norm_reference(x, s, b, 1e-5)
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        got = group_norm_reference(x, s, b, 1e-5)
        assert np.array_equal(np.asarray(base), np.asarray(got))
