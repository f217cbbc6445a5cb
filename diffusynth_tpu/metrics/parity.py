"""Output-fidelity harness: spectrogram MAE vs the in-process PyTorch
reference over the FULL pipeline.

BASELINE.md's fidelity target is spectrogram MAE < 1e-3 vs the PyTorch
reference given identical weights and inputs. The pretrained checkpoints
are not obtainable in this environment (no network), so the strongest
evidence available is an end-to-end run with the SAME (randomly
initialized, torch-side) weights converted through compat/ on BOTH
pipelines:

  reference:  torch DiffSynthSampler (model/DiffSynthSampler.py:296-536)
              -> VQ quantize (model/VQGAN.py:98) -> decoder
              (model/VQGAN.py:329-400) -> decode_stft/depad
              (tools.py:334-345,185-191) -> istft (webUI/.../utils.py:241,
              librosa shimmed to torch.istft)
  ours:       DiffSynthSampler + DiffuSynthRuntime.decode_latents (one
              fused XLA program per width)

run_e2e_parity() measures both the decode tail in isolation and the whole
text2sound chain; benchmarks/parity_e2e.py runs it at the production
config and docs/PARITY_E2E.md records the committed numbers.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def spectrogram_mae(a: np.ndarray, b: np.ndarray) -> float:
    """Mean absolute error between two STFT+ encodings (any matching shape)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    assert a.shape == b.shape, (a.shape, b.shape)
    return float(np.mean(np.abs(a - b)))


def _nchw(x_nhwc: np.ndarray):
    import torch

    return torch.from_numpy(np.ascontiguousarray(
        np.transpose(x_nhwc, (0, 3, 1, 2))))


def build_converted_pair(vqgan_cfg: Optional[dict] = None,
                         unet_cfg: Optional[dict] = None,
                         seed: int = 0,
                         flax_unet_overrides: Optional[dict] = None):
    """Instantiate the reference torch VQGAN + ConditionedUnet at random
    init and a DiffuSynthRuntime carrying the SAME weights (via compat/).

    Returns (torch_vqgan, torch_unet, runtime). Configs default to the
    production values (reference: app.py:32-40); pass reduced dicts for
    fast tests. flax_unet_overrides: extra UNetConfig fields applied to
    the flax side ONLY (e.g. quantize="int8" to measure the int8
    inference path's fidelity against the float reference).
    """
    import torch

    from diffusynth_tpu.compat.reference_env import setup_reference_imports

    setup_reference_imports()
    from model.diffusion import ConditionedUnet as TorchUnet
    from model.VQGAN import VQGAN as TorchVQGAN

    import jax
    import jax.numpy as jnp

    from diffusynth_tpu.compat import convert_unet_state, convert_vqgan_state
    from diffusynth_tpu.configs import AppConfig, UNetConfig, VQGANConfig
    from diffusynth_tpu.pipelines.runtime import DiffuSynthRuntime

    app = AppConfig()
    if vqgan_cfg is None:
        vqgan_cfg = dict(
            in_channels=3, hidden_channels=list(app.vqgan.hidden_channels),
            embedding_dim=app.vqgan.embedding_dim, out_channels=3,
            block_depth=app.vqgan.block_depth,
            attn_pos=list(app.vqgan.attn_pos), attn_with_skip=True,
            num_embeddings=app.vqgan.num_embeddings, commitment_cost=0.25,
            decay=0.99, norm_type="groupnorm", act_type="swish",
            num_groups=app.vqgan.num_groups)
    if unet_cfg is None:
        unet_cfg = dict(in_dim=4, down_dims=list(app.unet.down_dims),
                        up_dims=list(app.unet.up_dims),
                        attn_type=app.unet.attn_type,
                        condition_type="natural_language_prompt",
                        label_emb_dim=app.unet.label_emb_dim)

    torch.manual_seed(seed)
    t_vqgan = TorchVQGAN(**vqgan_cfg).eval()
    t_unet = TorchUnet(**unet_cfg).eval()

    f_vq_cfg = VQGANConfig(
        hidden_channels=tuple(vqgan_cfg["hidden_channels"]),
        embedding_dim=vqgan_cfg["embedding_dim"],
        block_depth=vqgan_cfg["block_depth"],
        attn_pos=tuple(vqgan_cfg["attn_pos"]),
        num_embeddings=vqgan_cfg["num_embeddings"],
        num_groups=vqgan_cfg["num_groups"])
    f_unet_cfg = UNetConfig(
        down_dims=tuple(unet_cfg["down_dims"]),
        up_dims=tuple(unet_cfg["up_dims"]),
        attn_type=unet_cfg["attn_type"],
        label_emb_dim=unet_cfg["label_emb_dim"],
        fused_kernels=False,
        **(flax_unet_overrides or {}))

    config = AppConfig(vqgan=f_vq_cfg, unet=f_unet_cfg,
                       compute_dtype="float32")
    rt = DiffuSynthRuntime(config)
    rt.vqgan_variables = convert_vqgan_state(
        t_vqgan.state_dict(), rt.vqgan_variables)
    rt.unet_variables = convert_unet_state(
        t_unet.state_dict(), rt.unet_variables)
    return t_vqgan, t_unet, rt


def run_e2e_parity(vqgan_cfg: Optional[dict] = None,
                   unet_cfg: Optional[dict] = None,
                   batch: int = 2, width: int = 64, steps: int = 5,
                   cfg_scale: float = 3.0, seed: int = 0,
                   flax_unet_overrides: Optional[dict] = None,
                   ) -> Dict[str, float]:
    """Full-chain fidelity vs the in-process torch reference with the same
    converted weights. Returns MAEs per stage; see module docstring."""
    import torch

    t_vqgan, t_unet, rt = build_converted_pair(vqgan_cfg, unet_cfg, seed,
                                               flax_unet_overrides)
    from model.DiffSynthSampler import DiffSynthSampler as RefSampler
    from tools import decode_stft as ref_decode_stft
    from tools import depad_STFT as ref_depad
    import librosa  # the shim (torch.istft)

    import jax
    import jax.numpy as jnp

    from diffusynth_tpu.diffusion.schedule import respaced_timesteps

    a = rt.config.audio
    d = rt.config.diffusion
    H, C = a.latent_height, a.channels
    rng = np.random.default_rng(seed)
    template = rng.standard_normal((batch, C, H, d.train_width)).astype(
        np.float32)
    cond = rng.standard_normal((batch, rt.config.unet.label_emb_dim)).astype(
        np.float32)
    uncond = np.zeros(rt.config.unet.label_emb_dim, np.float32)
    out: Dict[str, float] = {}

    # ---- stage 1: decode tail in isolation (random latents) --------------
    latents = rng.standard_normal((batch, H, width, C)).astype(np.float32)
    with torch.no_grad():
        zq_t = t_vqgan._vq_vae(_nchw(latents))[0]
        stft_plus_t = t_vqgan._decoder(zq_t).numpy()        # (B,3,F,T)
        audio_t = np.stack([
            librosa.istft(ref_depad(ref_decode_stft(s)),
                          hop_length=a.hop_length, win_length=a.win_length)
            for s in stft_plus_t
        ])
    enc_j, audio_j = rt.decode_latents(jnp.asarray(latents))
    enc_j = np.transpose(np.asarray(enc_j, np.float32), (0, 3, 1, 2))
    audio_j = np.asarray(audio_j, np.float32)
    out["decode_spectrogram_mae"] = spectrogram_mae(enc_j, stft_plus_t)
    n = min(audio_j.shape[-1], audio_t.shape[-1])
    out["decode_audio_mae"] = spectrogram_mae(audio_j[..., :n],
                                              audio_t[..., :n])

    # ---- stage 2: whole text2sound chain (DDIM, CFG, same template) ------
    ref = RefSampler(d.timesteps, device="cpu", mute=True, height=H,
                     max_batchsize=max(batch, 16), max_width=256, channels=C,
                     train_width=d.train_width, noise_strategy="repeat")
    use_ts = list(respaced_timesteps(d.timesteps, steps))
    ref.respace(use_ts)
    ref.activate_classifier_free_guidance(cfg_scale, torch.from_numpy(uncond))

    def t_model(x, t, condition=None):
        with torch.no_grad():
            return t_unet(x, t, condition)

    lat_t, _ = ref.sample(t_model, (batch, C, H, width), return_tensor=True,
                          condition=torch.from_numpy(cond),
                          initial_noise=torch.from_numpy(template))
    lat_t = lat_t[-1]
    with torch.no_grad():
        zq_t = t_vqgan._vq_vae(lat_t)[0]
        stft_plus_t = t_vqgan._decoder(zq_t).numpy()
        audio_t = np.stack([
            librosa.istft(ref_depad(ref_decode_stft(s)),
                          hop_length=a.hop_length, win_length=a.win_length)
            for s in stft_plus_t
        ])

    s = rt.make_sampler()
    s.respace(use_ts)
    s.activate_classifier_free_guidance(cfg_scale, jnp.asarray(uncond))
    tmpl_nhwc = jnp.asarray(np.transpose(template, (0, 2, 3, 1)))
    lat_j, _ = s.sample(rt.unet_variables, (batch, H, width, C),
                        jax.random.key(seed), condition=jnp.asarray(cond),
                        initial_noise=tmpl_nhwc, sampler="ddim")
    out["t2s_latent_mae"] = spectrogram_mae(
        np.transpose(np.asarray(lat_j, np.float32), (0, 3, 1, 2)),
        lat_t.numpy())
    enc_j, audio_j = rt.decode_latents(lat_j)
    enc_j = np.transpose(np.asarray(enc_j, np.float32), (0, 3, 1, 2))
    audio_j = np.asarray(audio_j, np.float32)
    out["t2s_spectrogram_mae"] = spectrogram_mae(enc_j, stft_plus_t)
    n = min(audio_j.shape[-1], audio_t.shape[-1])
    out["t2s_audio_mae"] = spectrogram_mae(audio_j[..., :n],
                                           audio_t[..., :n])
    return out
