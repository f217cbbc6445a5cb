"""int8 W8A8 quantized conv path (ops/quant.py) — correctness, gating,
gradients, and the ConvNeXt-body integration.

New TPU-design component (no reference counterpart — the reference is f32
CUDA throughout, /root/reference/model/diffusion_components.py:107-139 runs
its ConvNeXt convs unquantized); fidelity budget comes from BASELINE.md's
spectrogram-MAE target, pinned end-to-end in test_parity_e2e.py.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusynth_tpu.ops.quant import (
    INT8_MIN_K,
    int8_conv,
    want_int8,
)


def _ref_conv(x, w, stride=1, pad=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NHWC", "HWIO", "NHWC")))


class TestInt8Conv:
    def test_matches_f32_conv_within_quant_error(self):
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (2, 8, 8, 256), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(1),
                              (3, 3, 256, 128), jnp.float32) * 0.05
        ref = np.asarray(_ref_conv(x, w))
        got = np.asarray(int8_conv(x, w))
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert rel < 0.03, rel   # per-tensor dynamic int8 ~1-2% typical

    def test_exact_on_integer_grid(self):
        """Inputs/weights already on the int8 grid round-trip exactly
        (symmetric scheme, int32 accumulation)."""
        rng = np.random.default_rng(2)
        xn = rng.integers(-127, 128, (1, 4, 4, 8)).astype(np.float32)
        xn.flat[0] = 127.0   # amax exactly 127 -> activation scale 1
        # weights on {-127, 0, 127}: per-channel scale is exactly 1
        wn = (rng.integers(-1, 2, (3, 3, 8, 16)) * 127).astype(np.float32)
        wn[0, 0, 0, :] = 127.0   # every cout channel has amax 127
        x, w = jnp.asarray(xn), jnp.asarray(wn)
        ref = np.asarray(_ref_conv(x, w))
        got = np.asarray(int8_conv(x, w))
        np.testing.assert_allclose(got, ref, rtol=1e-6)

    def test_bf16_input_supported(self):
        x = jax.random.normal(jax.random.PRNGKey(3),
                              (2, 8, 8, 32), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(4),
                              (3, 3, 32, 64), jnp.float32) * 0.1
        out = int8_conv(x, w)
        assert out.dtype == jnp.float32
        assert out.shape == (2, 8, 8, 64)

    def test_gradients_flow(self):
        """custom_vjp backward (straight-through via the bf16 conv)."""
        x = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 8, 16))
        w = jax.random.normal(jax.random.PRNGKey(6), (3, 3, 16, 8)) * 0.1

        def loss(x, w):
            return jnp.sum(int8_conv(x, w) ** 2)

        gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
        ref_gx, ref_gw = jax.grad(
            lambda x, w: jnp.sum(_ref_conv(x, w) ** 2), argnums=(0, 1)
        )(x, w)
        assert np.all(np.isfinite(np.asarray(gx)))
        # straight-through: gradient direction matches the float conv's
        cos = np.sum(np.asarray(gw) * np.asarray(ref_gw)) / (
            np.linalg.norm(gw) * np.linalg.norm(ref_gw))
        assert cos > 0.95, cos


class TestGate:
    @pytest.mark.parametrize("k,n,expect", [
        (384, 192, True),    # measured 1.96x
        (768, 384, True),    # measured 1.75x
        (192, 768, True),    # measured 1.24-1.36x
        (192, 96, False),    # measured 1.10x (loses after quant overhead)
        (96, 384, False),    # measured 1.18x gross, 0.93x net
        (96, 192, False),
    ])
    def test_win_regime(self, k, n, expect):
        assert want_int8("int8", k, n) is expect

    def test_off_modes(self):
        assert not want_int8(None, 768, 768)
        assert not want_int8(False, 768, 768)
        assert INT8_MIN_K == 256


class TestConvNextBodyInt8:
    def _body_args(self, C=128, D=256, Co=128, H=8, W=8, B=2, seed=0):
        rng = np.random.default_rng(seed)
        r = lambda *s: jnp.asarray(
            rng.standard_normal(s).astype(np.float32))
        return dict(
            h=r(B, H, W, C), temb_vec=r(B, C), xres=r(B, H, W, C),
            g1s=jnp.ones((C,)), g1b=jnp.zeros((C,)),
            w1=r(3, 3, C, D) * 0.05, b1=jnp.zeros((D,)),
            g2s=jnp.ones((D,)), g2b=jnp.zeros((D,)),
            w2=r(3, 3, D, Co) * 0.05, b2=jnp.zeros((Co,)),
            wres=None, bres=None,
        )

    def test_quantized_body_close_to_reference(self):
        from diffusynth_tpu.ops.fused_block import convnext_body

        args = self._body_args()
        ref = np.asarray(convnext_body(**args))
        # D=256 >= INT8_MIN_K -> conv2 quantized; C=128 < all gates.
        got = np.asarray(convnext_body(**args, quantize="int8"))
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        assert 0 < rel < 0.05, rel   # changed (so int8 ran), but close

    def test_quantize_none_bit_identical(self):
        from diffusynth_tpu.ops.fused_block import convnext_body

        args = self._body_args(seed=1)
        a = np.asarray(convnext_body(**args))
        b = np.asarray(convnext_body(**args, quantize=None))
        np.testing.assert_array_equal(a, b)

    def test_unet_config_roundtrip(self):
        from diffusynth_tpu.configs import UNetConfig

        cfg = dataclasses.replace(UNetConfig(), quantize="int8")
        cfg2 = UNetConfig.from_json(cfg.to_json())
        assert cfg2.quantize == "int8"

    def test_quantized_unet_forward_small(self):
        """Full ConditionedUnet with quantize='int8' at reduced dims that
        still cross the int8 gate (mid convs 256->512)."""
        from diffusynth_tpu.configs import UNetConfig
        from diffusynth_tpu.nn.unet import ConditionedUnet

        cfg = dataclasses.replace(
            UNetConfig(), down_dims=(64, 64, 128, 256),
            up_dims=(256, 256, 128, 64), quantize="int8")
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 16, 4))
        t = jnp.array([500])
        c = jax.random.normal(jax.random.PRNGKey(1), (1, 512))
        model = ConditionedUnet(cfg)
        params = jax.jit(model.init)(jax.random.PRNGKey(2), x, t, c)
        y = jax.jit(model.apply)(params, x, t, c)
        assert y.shape == (1, 32, 16, 4)
        assert bool(jnp.all(jnp.isfinite(y)))

        # Same weights, quantize off: close but not identical.
        base = ConditionedUnet(dataclasses.replace(cfg, quantize=None))
        y0 = jax.jit(base.apply)(params, x, t, c)
        rel = float(jnp.linalg.norm(y - y0) / jnp.linalg.norm(y0))
        assert 0 < rel < 0.1, rel
