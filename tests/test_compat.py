"""torch -> flax weight-conversion parity tests.

Each test instantiates the ACTUAL reference torch model (imported from
/root/reference, never copied) with random weights, converts the state_dict
through diffusynth_tpu.compat, and asserts the flax forward output matches
the torch forward output on the same input - the mechanism that makes the
reference's pretrained checkpoints loadable at < 1e-3 spectrogram MAE
(BASELINE.md).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REFERENCE = "/root/reference"
HAS_REFERENCE = os.path.isdir(os.path.join(REFERENCE, "model"))

pytestmark = pytest.mark.skipif(not HAS_REFERENCE,
                                reason="reference repo not mounted")

if HAS_REFERENCE:
    sys.path.insert(0, REFERENCE)
    # The reference imports torchvision (discriminator backbone, unused
    # here) and a metrics.IS module missing from its own repo; stub both so
    # the model classes import.
    import types

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_models = types.ModuleType("torchvision.models")

        def _no_resnet(*a, **k):
            raise RuntimeError("torchvision stub: discriminator not used")

        tv_models.resnet18 = _no_resnet
        tv.models = tv_models
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv_models
    if "librosa" not in sys.modules:
        # tools.py imports librosa at module level; only create_key is used.
        sys.modules["librosa"] = types.ModuleType("librosa")
    if "metrics" not in sys.modules:
        metrics_pkg = types.ModuleType("metrics")
        metrics_is = types.ModuleType("metrics.IS")
        metrics_is.get_inception_score = lambda *a, **k: 0.0
        metrics_pkg.IS = metrics_is
        sys.modules["metrics"] = metrics_pkg
        sys.modules["metrics.IS"] = metrics_is

import torch  # noqa: E402

from diffusynth_tpu.compat import (  # noqa: E402
    convert_multimodal_state,
    convert_timbre_state,
    convert_unet_state,
    convert_vqgan_state,
)
from diffusynth_tpu.configs import (  # noqa: E402
    MultiModalConfig,
    TimbreEncoderConfig,
    UNetConfig,
    VQGANConfig,
)
from diffusynth_tpu.nn import (  # noqa: E402
    ConditionedUnet,
    MultiModalModel,
    TimbreEncoder,
    VQGAN,
)


def _nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(
        np.transpose(x_nhwc, (0, 3, 1, 2))))


def _to_nhwc(t: torch.Tensor) -> np.ndarray:
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


class TestVQGANConversion:
    @pytest.fixture(scope="class")
    def pair(self):
        """Small-but-real config exercising attention and both stacks."""
        from model.VQGAN import VQGAN as TorchVQGAN

        cfg = dict(in_channels=3, hidden_channels=[16, 32], embedding_dim=4,
                   out_channels=3, block_depth=2, attn_pos=[16, 32],
                   attn_with_skip=True, num_embeddings=64,
                   commitment_cost=0.25, decay=0.99, norm_type="groupnorm",
                   act_type="swish", num_groups=8)
        torch.manual_seed(0)
        tmodel = TorchVQGAN(**cfg).eval()
        fcfg = VQGANConfig(hidden_channels=(16, 32), attn_pos=(16, 32),
                           num_embeddings=64, num_groups=8)
        fmodel = VQGAN(fcfg)
        x = np.random.default_rng(0).standard_normal((2, 64, 32, 3)).astype(
            np.float32)
        variables = fmodel.init(jax.random.key(0), jnp.asarray(x))
        converted = convert_vqgan_state(tmodel.state_dict(), variables)
        return tmodel, fmodel, converted, x

    def test_encoder_parity(self, pair):
        tmodel, fmodel, variables, x = pair
        with torch.no_grad():
            ref = _to_nhwc(tmodel._encoder(_nchw(x)))
        ours = np.asarray(
            fmodel.apply(variables, jnp.asarray(x), method=fmodel.encode))
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)

    def test_full_forward_parity(self, pair):
        tmodel, fmodel, variables, x = pair
        with torch.no_grad():
            vq_loss_t, recon_t, _ = tmodel(_nchw(x))
        vq_loss_f, recon_f, _ = fmodel.apply(variables, jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(recon_f), _to_nhwc(recon_t), atol=5e-4, rtol=1e-3)
        np.testing.assert_allclose(
            float(vq_loss_f), float(vq_loss_t), atol=1e-4, rtol=1e-3)

    def test_decoder_parity(self, pair):
        tmodel, fmodel, variables, x = pair
        z = np.random.default_rng(1).standard_normal((2, 16, 8, 4)).astype(
            np.float32)
        with torch.no_grad():
            ref = _to_nhwc(tmodel._decoder(_nchw(z)))
        ours = np.asarray(
            fmodel.apply(variables, jnp.asarray(z), method=fmodel.decode))
        np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


class TestUNetConversion:
    @pytest.fixture(scope="class", params=["linear_add", "linear_cat"])
    def pair(self, request):
        from model.diffusion import ConditionedUnet as TorchUnet

        attn = request.param
        cfg = dict(in_dim=4, down_dims=[8, 8, 16, 32],
                   up_dims=[32, 32, 16, 8], attn_type=attn,
                   condition_type="natural_language_prompt",
                   label_emb_dim=16)
        torch.manual_seed(0)
        tmodel = TorchUnet(**cfg).eval()
        fcfg = UNetConfig(down_dims=(8, 8, 16, 32), up_dims=(32, 32, 16, 8),
                          attn_type=attn, label_emb_dim=16)
        fmodel = ConditionedUnet(fcfg)
        x = np.random.default_rng(0).standard_normal((2, 32, 16, 4)).astype(
            np.float32)
        t = np.array([7, 123], dtype=np.int64)
        cond = np.random.default_rng(1).standard_normal((2, 16)).astype(
            np.float32)
        variables = fmodel.init(jax.random.key(0), jnp.asarray(x),
                                jnp.asarray(t), jnp.asarray(cond))
        converted = convert_unet_state(tmodel.state_dict(), variables)
        return tmodel, fmodel, converted, x, t, cond

    def test_conditioned_forward_parity(self, pair):
        tmodel, fmodel, variables, x, t, cond = pair
        with torch.no_grad():
            ref = _to_nhwc(tmodel(_nchw(x), torch.from_numpy(t),
                                  torch.from_numpy(cond)))
        ours = np.asarray(fmodel.apply(variables, jnp.asarray(x),
                                       jnp.asarray(t), jnp.asarray(cond)))
        np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)

    def test_unconditional_forward_parity(self, pair):
        tmodel, fmodel, variables, x, t, cond = pair
        with torch.no_grad():
            ref = _to_nhwc(tmodel(_nchw(x), torch.from_numpy(t), None))
        ours = np.asarray(fmodel.apply(variables, jnp.asarray(x),
                                       jnp.asarray(t), None))
        np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


class TestTimbreConversion:
    def test_forward_parity(self):
        from model.timbre_encoder_pretrain import TimbreEncoder as TorchTE

        cfg = dict(input_dim=64, feature_dim=32, hidden_dim=24,
                   num_instrument_classes=8, num_instrument_family_classes=11,
                   num_velocity_classes=16, num_qualities=10, num_layers=2)
        torch.manual_seed(0)
        tmodel = TorchTE(**cfg).eval()
        fcfg = TimbreEncoderConfig(
            input_dim=64, feature_dim=32, hidden_dim=24,
            num_instrument_classes=8, num_instrument_family_classes=11,
            num_velocity_classes=16, num_qualities=10, num_layers=2)
        fmodel = TimbreEncoder(fcfg)

        # NHWC (B, H, W, C); torch consumes (B, C, H, W) -> (B, C*H, W).
        x = np.random.default_rng(0).standard_normal((2, 16, 12, 4)).astype(
            np.float32)
        variables = fmodel.init(jax.random.key(0), jnp.asarray(x))
        converted = convert_timbre_state(tmodel.state_dict(), variables)

        with torch.no_grad():
            feat_t, inst_t, fam_t, vel_t, qual_t = tmodel(_nchw(x))
        feat_f, inst_f, fam_f, vel_f, qual_f = fmodel.apply(
            converted, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(feat_f), feat_t.numpy(),
                                   atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(inst_f), inst_t.numpy(),
                                   atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(qual_f), qual_t.numpy(),
                                   atol=2e-4, rtol=1e-3)


class TestMultiModalConversion:
    def test_text_projection_parity(self):
        from model.multimodal_model import multi_modal_model as TorchMMM
        from model.timbre_encoder_pretrain import TimbreEncoder as TorchTE

        torch.manual_seed(0)
        te = TorchTE(input_dim=64, feature_dim=32, hidden_dim=24,
                     num_instrument_classes=8,
                     num_instrument_family_classes=11,
                     num_velocity_classes=16, num_qualities=10, num_layers=1)

        class _StubText(torch.nn.Module):
            def get_text_features(self, **kw):
                raise NotImplementedError

        tmodel = TorchMMM(te, _StubText(), spectrogram_feature_dim=24,
                          text_feature_dim=12, multi_modal_emb_dim=16,
                          temperature=1.0, dropout=0.0,
                          num_projection_layers=2).eval()

        fcfg = MultiModalConfig(text_feature_dim=12,
                                spectrogram_feature_dim=24,
                                multi_modal_emb_dim=16, dropout=0.0)
        tcfg = TimbreEncoderConfig(
            input_dim=64, feature_dim=32, hidden_dim=24,
            num_instrument_classes=8, num_instrument_family_classes=11,
            num_velocity_classes=16, num_qualities=10, num_layers=1)
        fmodel = MultiModalModel(fcfg, tcfg)

        latents = np.random.default_rng(0).standard_normal(
            (2, 16, 12, 4)).astype(np.float32)
        text_feats = np.random.default_rng(1).standard_normal(
            (2, 12)).astype(np.float32)
        variables = fmodel.init(jax.random.key(0), jnp.asarray(latents),
                                jnp.asarray(text_feats))
        converted = convert_multimodal_state(tmodel.state_dict(), variables)

        with torch.no_grad():
            ref = tmodel.text_projection(torch.from_numpy(text_feats)).numpy()
        ours = np.asarray(fmodel.apply(
            converted, jnp.asarray(text_feats),
            method=fmodel.get_text_features))
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)

        with torch.no_grad():
            ref_timbre = tmodel.get_timbre_features(_nchw(latents)).numpy()
        ours_timbre = np.asarray(fmodel.apply(
            converted, jnp.asarray(latents),
            method=fmodel.get_timbre_features))
        np.testing.assert_allclose(ours_timbre, ref_timbre, atol=2e-4,
                                   rtol=1e-3)
