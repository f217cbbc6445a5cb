"""DiffuSynthRuntime: owns model params and the jitted device programs every
pipeline shares.

Plays the role of the reference's GradioWebUI config hub + split-VAE handles
(reference: webUI/.../gradio_webUI.py:11-55, app.py:30-66), redesigned so the
hot paths are whole-program XLA launches:

  * decode_latents: quantize -> VQ-GAN decoder -> STFT+ decode -> ISTFT,
    one jit per latent width (the reference decodes then loops librosa.istft
    per sample on the host, utils.py:224-245).
  * encode_audio: STFT -> STFT+ -> encoder -> quantize, one jit per width.
  * unet_apply: the denoiser callable handed to DiffSynthSampler.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffusynth_tpu.configs import AppConfig
from diffusynth_tpu.diffusion.sampler import DiffSynthSampler
from diffusynth_tpu.dsp import (
    decode_stft,
    depad_stft,
    encode_stft,
    istft,
    pad_stft,
    stft,
)
from diffusynth_tpu.nn.unet import ConditionedUnet
from diffusynth_tpu.nn.vqgan import VQGAN
from diffusynth_tpu.text import get_text_encoder


def _dtype_of(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


def _mesh_id(mesh) -> str:
    """Stable descriptor of a mesh for AOT fast keys: a decode executable
    compiled without a mesh must not fast-load into a mesh run whose
    latents arrive sharded by the sampler (advisor r4 — the sharding
    mismatch would surface as a call-time error with no fallback, because
    the fast path skips the lowered-text verification)."""
    if mesh is None:
        return "nomesh"
    return (f"mesh{tuple(mesh.devices.shape)}:{mesh.axis_names}:"
            f"{tuple(int(d.id) for d in mesh.devices.flat)}")


class DiffuSynthRuntime:
    """Bundle of models, params, text encoder, and jitted codec programs."""

    def __init__(
        self,
        config: Optional[AppConfig] = None,
        vqgan_variables: Optional[Dict] = None,
        unet_variables: Optional[Dict] = None,
        text_encoder=None,
        seed: int = 0,
        mesh=None,
        loop_mode: str = "scan",
    ):
        """mesh: optional jax.sharding.Mesh - batched generation (timbres,
        MIDI notes) shards its batch axis over it (DP over ICI).

        loop_mode: "scan" (default since r4) runs the whole denoising
        loop as ONE fused lax.scan program — measured 8.887 s device vs
        the python step loop's 9.016 s for the b64/50-step headline
        (two independent runs each, RESULTS_r4.md §8), compiles in
        ~55 s on the current backend (vs 354-621 s when the r1 scan
        fault forced the python default), and cold-starts with ~4 tiny
        helper programs instead of ~33. "python" (per-step dispatch)
        and "window" remain available and equivalence-tested
        (tests/test_sampler_loop_modes.py); the scan fence
        (DIFFUSYNTH_BAD_SCAN_BATCHES) still falls back to python per
        signature if a compiler fault ever regresses."""
        self.mesh = mesh
        self.loop_mode = loop_mode
        self.config = config or AppConfig()
        dtype = _dtype_of(self.config.compute_dtype)
        self.vqgan = VQGAN(self.config.vqgan, dtype=dtype)
        self.unet = ConditionedUnet(self.config.unet, dtype=dtype)
        a = self.config.audio

        key = jax.random.key(seed)
        k_vq, k_unet = jax.random.split(key)
        # Inits MUST be jitted: unjitted flax init runs eagerly op-by-op
        # through the axon tunnel (measured 459 s for this pair vs ~60 s
        # jitted — benchmarks/cold_start.py r2). aot_jit additionally
        # caches the compiled init executables across processes — after
        # the sampler/decode programs started cache-loading in ~2 s
        # (RESULTS_r3.md section 8), the init compiles became the
        # dominant cold-start term.
        from diffusynth_tpu.utils.aot_cache import aot_jit

        # fast_key: the full program identity of each init (model config +
        # compute dtype) — later processes then skip trace/lower and
        # deserialize directly (aot_cache.py fast path).
        if vqgan_variables is None:
            x0 = jnp.zeros((1, a.freq_resolution, a.time_resolution, 3))
            vqgan_variables = aot_jit(
                self.vqgan.init, name="vqgan_init",
                fast_key=("init", repr(self.config.vqgan),
                          self.config.compute_dtype,
                          _mesh_id(mesh)))(k_vq, x0)
        if unet_variables is None:
            z0 = jnp.zeros((1, a.latent_height, 8, a.channels))
            unet_variables = aot_jit(
                self.unet.init, name="unet_init",
                fast_key=("init", repr(self.config.unet),
                          self.config.compute_dtype, _mesh_id(mesh)))(
                k_unet, z0, jnp.zeros(1, jnp.int32),
                jnp.zeros((1, self.config.unet.label_emb_dim)),
            )
        self.vqgan_variables = vqgan_variables
        self.unet_variables = unet_variables
        self.text_encoder = text_encoder or get_text_encoder(
            prefer_clap=self.config.use_pretrained_clap
        )

        def unet_apply(params, x, t, cond, cfg_dual=False):
            # params MUST be threaded as an argument (never closed over):
            # captured weights become literal constants in the lowered HLO,
            # bloating the program by ~100 MB and breaking remote compile.
            return self.unet.apply(params, x, t, cond, cfg_dual=cfg_dual)

        # Advertise CFG prefix sharing (nn/unet.py cfg_dual): the sampler
        # then runs the condition-independent U-Net prefix once per step
        # instead of twice (RESULTS_r2.md H13).
        unet_apply.supports_cfg_dual = True
        # Program identity for the sampler's fast-keyed AOT entries
        # (everything this closure bakes into a lowered step program).
        unet_apply.program_identity = (repr(self.config.unet),
                                       self.config.compute_dtype)
        self.unet_apply = unet_apply

    @classmethod
    def from_pretrained(
        cls,
        models_dir: str,
        vqgan_name: str = "vqgan",
        unet_name: str = "unet",
        config: Optional[AppConfig] = None,
        use_ema: bool = False,
        lora_name: Optional[str] = None,
        **kwargs,
    ) -> "DiffuSynthRuntime":
        """Load a runtime from converted orbax checkpoints.

        Mirrors the reference's load path (app.py:30-41: get_VQGAN /
        get_diffusion_model with load_pretrain=True); .pth files convert via
        `python -m diffusynth_tpu.compat.convert_cli`. use_ema=True prefers
        the "UNet_ema" role written by training with ema_decay > 0
        (beyond-reference; falls back to the live weights if absent).
        lora_name loads a "<lora_name>_UNet_lora" adapter (written by
        `train.run --lora-rank`, rank/alpha/targets read from its
        hyperparameter sidecar) and bakes it into the U-Net weights via
        train.lora.merge_lora — zero inference overhead.
        """
        from diffusynth_tpu.train.checkpoints import Checkpointer

        rt = cls(config=config, **kwargs)  # random init as restore template
        ckpt = Checkpointer(models_dir)
        if ckpt.exists(vqgan_name, "imageVQVAE"):
            restored = ckpt.restore(
                vqgan_name, "imageVQVAE",
                {"variables": rt.vqgan_variables, "step": 0})
            rt.vqgan_variables = restored["variables"]
        unet_role = ("UNet_ema"
                     if use_ema and ckpt.exists(unet_name, "UNet_ema")
                     else "UNet")
        if ckpt.exists(unet_name, unet_role):
            restored = ckpt.restore(
                unet_name, unet_role,
                {"variables": rt.unet_variables, "step": 0})
            rt.unet_variables = restored["variables"]
        if lora_name is not None:
            import json as _json
            import os as _os

            from diffusynth_tpu.train.lora import init_lora, merge_lora

            if not ckpt.exists(lora_name, "UNet_lora"):
                raise FileNotFoundError(
                    f"no {lora_name}_UNet_lora checkpoint in {models_dir}")
            hp_path = _os.path.join(ckpt.root, "hyperparameters",
                                    f"{lora_name}_UNet_lora.json")
            rank, alpha, targets = 8, 16.0, None
            if _os.path.exists(hp_path):
                with open(hp_path) as f:
                    hp = _json.load(f)
                rank = int(hp.get("rank", rank))
                alpha = float(hp.get("alpha", alpha))
                targets = hp.get("targets", None)
            else:
                # A wrong rank surfaces as an opaque orbax shape mismatch
                # below and a wrong alpha would load silently with wrong
                # merge scaling — make the defaulting loud.
                import warnings

                warnings.warn(
                    f"{hp_path} missing: assuming LoRA rank={rank}, "
                    f"alpha={alpha}. train_diffusion_lora writes this "
                    "sidecar; restore will fail on any rank mismatch.",
                    stacklevel=2)
            template = {"variables": init_lora(
                rt.unet_variables, jax.random.key(0), rank, targets),
                "step": 0}
            adapter = ckpt.restore(lora_name, "UNet_lora", template)
            rt.unet_variables = merge_lora(
                rt.unet_variables, adapter["variables"], alpha)
        return rt

    # -- samplers ------------------------------------------------------------

    def make_sampler(self) -> DiffSynthSampler:
        d = self.config.diffusion
        batch_sharding = None
        if self.mesh is not None:
            from diffusynth_tpu.parallel.mesh import batch_sharding as bs

            batch_sharding = bs(self.mesh, ndim=4)
        return DiffSynthSampler(
            self.unet_apply,
            timesteps=d.timesteps,
            beta_start=d.beta_start,
            beta_end=d.beta_end,
            height=d.height,
            channels=d.channels,
            train_width=d.train_width,
            max_width=d.max_width,
            noise_strategy=d.noise_strategy,
            loop_mode=self.loop_mode,
            batch_sharding=batch_sharding,
        )

    # -- jitted codec programs -----------------------------------------------

    @functools.cached_property
    def _decode_fn(self):
        a = self.config.audio
        vqgan = self.vqgan

        from diffusynth_tpu.utils.aot_cache import aot_jit

        @functools.partial(
            aot_jit, name="decode",
            static_argnames=("quantize", "audio_format"),
            fast_key=("decode", repr(self.config.vqgan),
                      repr(self.config.audio), self.config.compute_dtype,
                      _mesh_id(self.mesh)))
        def decode(variables, latents, quantize=True, audio_format="f32"):
            if quantize:
                latents, _, _ = vqgan.apply(
                    variables, latents, method=vqgan.quantize
                )
            enc = vqgan.apply(variables, latents, method=vqgan.decode)
            enc = enc.astype(jnp.float32)
            D = decode_stft(enc)                      # (B, F, T) complex
            D = depad_stft(D)                         # restore DC bin
            T = D.shape[-1]
            audio = istft(
                D, a.n_fft, a.hop_length, a.win_length,
                length=a.hop_length * (T - 1),
            )
            if audio_format == "int16":
                # WAV-ready PCM16 produced on device: exactly the host
                # conversion (native/src dsyn_wav_write: clip to [-1,1],
                # lrintf(v*32767) — round-half-even == jnp.round), at half
                # the host-transfer bytes through the tunnel.
                audio = jnp.round(
                    jnp.clip(audio, -1.0, 1.0) * 32767.0
                ).astype(jnp.int16)
            return latents, enc, audio

        return decode

    def decode_latents(
        self, latents: jnp.ndarray, quantize: bool = True,
        audio_format: str = "f32",
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(B, H, W, C) latents -> (STFT+ encodings (B, F, T, 3),
        audio (B, samples) f32 — or PCM int16 with audio_format="int16")."""
        _, enc, audio = self._decode_fn(self.vqgan_variables, latents,
                                        quantize=quantize,
                                        audio_format=audio_format)
        return enc, audio

    def decode_latents_full(self, latents: jnp.ndarray, quantize: bool = True,
                            audio_format: str = "f32"):
        """Like decode_latents but also returns the (quantized) latents -
        one fused program, no second quantization pass."""
        return self._decode_fn(self.vqgan_variables, latents,
                               quantize=quantize, audio_format=audio_format)

    @functools.cached_property
    def _encode_fn(self):
        a = self.config.audio
        vqgan = self.vqgan

        from diffusynth_tpu.utils.aot_cache import aot_jit

        @functools.partial(
            aot_jit, name="encode",
            fast_key=("encode", repr(self.config.vqgan),
                      repr(self.config.audio), self.config.compute_dtype,
                      _mesh_id(self.mesh)))
        def encode(variables, audio):
            D = stft(audio, a.n_fft, a.hop_length, a.win_length)
            enc = encode_stft(pad_stft(D, None))      # (B, F, T, 3)
            z = vqgan.apply(variables, enc, method=vqgan.encode)
            zq, _, _ = vqgan.apply(variables, z, method=vqgan.quantize)
            return enc, z, zq

        return encode

    def encode_audio(self, audio: jnp.ndarray):
        """(B, samples) -> (STFT+ encodings, latents, quantized latents).

        samples should be hop * (vae_scale * W - 1) for a W-column latent
        (reference: sound2sound_with_text.py:80).
        """
        return self._encode_fn(self.vqgan_variables, audio)

    def quantize_latents(self, latents: jnp.ndarray) -> jnp.ndarray:
        zq, _, _ = self.vqgan.apply(
            self.vqgan_variables, latents, method=self.vqgan.quantize
        )
        return zq

    # -- text ------------------------------------------------------------

    def encode_text(self, prompts) -> jnp.ndarray:
        return jnp.asarray(self.text_encoder.encode(list(prompts)))
