"""End-to-end fidelity vs the in-process torch reference (VERDICT r1 #3).

Same converted random weights on both sides; the full chain — sampler ->
VQ quantize -> decoder -> STFT+ decode -> ISTFT — must agree to the
BASELINE.md target (< 1e-3 spectrogram MAE at f32). Production-config
numbers live in docs/PARITY_E2E.md (benchmarks/parity_e2e.py)."""

import os

import pytest

HAS_REFERENCE = os.path.isdir("/root/reference/model")
pytestmark = pytest.mark.skipif(not HAS_REFERENCE,
                                reason="reference repo not mounted")

VQGAN_CFG = dict(in_channels=3, hidden_channels=[16, 32], embedding_dim=4,
                 out_channels=3, block_depth=2, attn_pos=[16, 32],
                 attn_with_skip=True, num_embeddings=64,
                 commitment_cost=0.25, decay=0.99, norm_type="groupnorm",
                 act_type="swish", num_groups=8)
UNET_CFG = dict(in_dim=4, down_dims=[16, 16, 32, 64],
                up_dims=[64, 64, 32, 16], attn_type="linear_add",
                condition_type="natural_language_prompt", label_emb_dim=64)


def test_e2e_chain_parity():
    from diffusynth_tpu.metrics.parity import run_e2e_parity

    maes = run_e2e_parity(vqgan_cfg=VQGAN_CFG, unet_cfg=UNET_CFG,
                          batch=2, width=24, steps=4, cfg_scale=3.0)
    # Decode tail (quantize -> decoder -> STFT+ decode -> istft).
    assert maes["decode_spectrogram_mae"] < 1e-3, maes
    assert maes["decode_audio_mae"] < 1e-3, maes
    # Whole text2sound chain. The BASELINE.md target metric is the
    # SPECTROGRAM MAE; pre-decode latents carry the per-step f32
    # torch-vs-XLA eps difference (~1e-4, the converter tolerance)
    # amplified by 1/sqrt(alpha_bar) ~ 1e2 at the earliest DDIM step, so
    # they get a looser sanity bound.
    assert maes["t2s_latent_mae"] < 0.05, maes
    assert maes["t2s_spectrogram_mae"] < 1e-3, maes
    assert maes["t2s_audio_mae"] < 1e-3, maes
