"""Typed configuration for every model / pipeline in the framework.

The reference threads plain dicts hard-coded at call sites (reference:
app.py:32-56, colab notebook cells); here each component has a dataclass with
presets mirroring the reference's shipped production values, serializable to
JSON for checkpoint sidecars (reference: model/VQGAN.py:607-621).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple


def _asdict(cfg) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)


class _JsonMixin:
    def to_json(self) -> str:
        return json.dumps(_asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str):
        return cls(**json.loads(s))

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# Audio / DSP geometry (reference: gradio_webUI.py:11-55, sound2sound:85)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class AudioConfig(_JsonMixin):
    sample_rate: int = 16_000
    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    freq_resolution: int = 512      # padded STFT freq bins (513 -> drop DC -> 512)
    time_resolution: int = 256      # STFT frames for a nominal 4s note
    vae_scale: int = 4              # spatial down-scale of the VQ-GAN
    channels: int = 4               # latent channels
    latent_height: int = 128        # freq_resolution // vae_scale

    def width_from_duration(self, duration_sec: float) -> int:
        """Latent width for a note duration (reference: text2sound.py:84)."""
        return int(self.time_resolution * ((duration_sec + 1.0) / 4.0) / self.vae_scale)

    def audio_length_from_width(self, width: int) -> int:
        """Samples covered by a latent of `width` (reference: sound2sound:80)."""
        return self.hop_length * (self.vae_scale * width - 1)


# ---------------------------------------------------------------------------
# VQ-GAN (reference: app.py:32-35)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class VQGANConfig(_JsonMixin):
    in_channels: int = 3
    hidden_channels: Tuple[int, ...] = (80, 160)
    embedding_dim: int = 4
    out_channels: int = 3
    block_depth: int = 2
    attn_pos: Tuple[int, ...] = (80, 160)
    attn_with_skip: bool = True
    num_embeddings: int = 8192
    commitment_cost: float = 0.25
    decay: float = 0.99             # EMA decay; 0.0 selects the plain quantizer
    epsilon: float = 1e-5           # Laplace smoothing for EMA cluster sizes
    norm_type: str = "groupnorm"
    act_type: str = "swish"
    num_groups: int = 16

    def __post_init__(self):
        object.__setattr__(self, "hidden_channels", tuple(self.hidden_channels))
        object.__setattr__(self, "attn_pos", tuple(self.attn_pos))


# ---------------------------------------------------------------------------
# Conditioned U-Net (reference: app.py:40)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class UNetConfig(_JsonMixin):
    in_dim: int = 4
    out_dim: Optional[int] = None
    down_dims: Tuple[int, ...] = (96, 96, 192, 384)
    up_dims: Tuple[int, ...] = (384, 384, 192, 96)
    mid_depth: int = 3
    with_time_emb: bool = True
    time_dim: Optional[int] = None          # defaults to 4 * down_dims[0]
    resnet_block_groups: int = 8
    use_convnext: bool = True
    convnext_mult: int = 2
    attn_type: str = "linear_add"           # "linear_cat" | "linear_add"
    n_label_class: int = 11
    condition_type: str = "natural_language_prompt"
    label_emb_dim: int = 512
    # Fused Pallas block/attention kernels: None = auto (TPU, where shapes
    # qualify), False = force the XLA formulation. See ops/fused_block.py.
    fused_kernels: Optional[bool] = None
    # None | "int8": dynamic W8A8 int8 for the ConvNeXt 3x3 convs whose
    # contraction dim is in the measured MXU-win regime (ops/quant.py).
    # Inference/serving feature; fidelity gated by the BASELINE spectrogram
    # MAE budget (docs/PARITY_E2E.md).
    quantize: Optional[str] = None

    def __post_init__(self):
        object.__setattr__(self, "down_dims", tuple(self.down_dims))
        object.__setattr__(self, "up_dims", tuple(self.up_dims))


# ---------------------------------------------------------------------------
# Timbre encoder (reference: app.py:48)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class TimbreEncoderConfig(_JsonMixin):
    input_dim: int = 512
    feature_dim: int = 512
    hidden_dim: int = 1024
    num_instrument_classes: int = 1006
    num_instrument_family_classes: int = 11
    num_velocity_classes: int = 128
    num_qualities: int = 10
    num_layers: int = 3


# ---------------------------------------------------------------------------
# Multi-modal contrastive model (reference: app.py:55-56)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class MultiModalConfig(_JsonMixin):
    text_feature_dim: int = 512
    spectrogram_feature_dim: int = 1024
    multi_modal_emb_dim: int = 512
    num_projection_layers: int = 2
    temperature: float = 1.0
    dropout: float = 0.1
    freeze_text_encoder: bool = False
    freeze_spectrogram_encoder: bool = False


# ---------------------------------------------------------------------------
# Diffusion / sampler (reference: app.py:65, DiffSynthSampler.py:26-60)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class DiffusionConfig(_JsonMixin):
    timesteps: int = 1000
    beta_start: float = 1e-4
    beta_end: float = 0.02
    height: int = 128
    channels: int = 4
    train_width: int = 64
    max_width: int = 256
    max_batchsize: int = 16
    noise_strategy: str = "repeat"   # "repeat" | "non_repeat"


# ---------------------------------------------------------------------------
# Training presets (reference: colab notebook cells, SURVEY.md section 2 #26)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class VQGANTrainConfig(_JsonMixin):
    batch_size: int = 4
    lr: float = 1e-4
    d_lr: float = 1e-4
    vq_weight: float = 10.0
    adver_weight: float = 0.1
    w1: float = 1.0
    w2: float = 1.0
    threshold: float = 1e-3          # weighted-MAE epsilon
    max_iter: int = 10_000
    save_steps: int = 500
    model_name: str = "vqgan"
    # Forward/backward compute dtype (params and optimizer state stay
    # float32). bfloat16 is the TPU-native default (MXU-rate matmuls/convs);
    # "float32" reproduces the reference's training numerics exactly
    # (VQGAN.py:589-763 trains f32 on CUDA).
    compute_dtype: str = "bfloat16"
    # See DiffusionTrainConfig.steps_per_dispatch (same mechanism: K
    # alternating D/G iterations lax.scan inside one jitted dispatch).
    steps_per_dispatch: int = 1


@dataclass(frozen=True)
class DiffusionTrainConfig(_JsonMixin):
    batch_size: int = 8
    lr: float = 1e-4
    timesteps: int = 1000
    uncondition_rate: float = 0.1
    max_iter: int = 40_000
    save_steps: int = 5_000
    loss_type: str = "huber"
    model_name: str = "unet"
    # Weight EMA for sample quality (beyond-reference; standard for
    # diffusion). 0.0 = off (reference behavior); 0.999-0.9999 typical.
    # The EMA copy is checkpointed as a sibling "<name>_UNet_ema" role
    # (train/diffusion_train.py::ema_of_params); load it for inference
    # with DiffuSynthRuntime.from_pretrained(..., use_ema=True).
    ema_decay: float = 0.0
    # See VQGANTrainConfig.compute_dtype.
    compute_dtype: str = "bfloat16"
    # Optimizer steps per jitted dispatch (lax.scan over K stacked
    # batches). 1 = reference-shaped loop. K > 1 amortizes the per-call
    # host/tunnel marshaling of the donated params+opt_state pytree
    # (~0.4 s/call on the axon tunnel vs 54 ms of device time at b8 —
    # RESULTS_r2.md config-5); semantics match K sequential steps modulo
    # the PRNG stream. Checkpoint/log cadence is kept (boundary-crossing
    # checks in train_diffusion_model).
    steps_per_dispatch: int = 1


@dataclass(frozen=True)
class TimbreTrainConfig(_JsonMixin):
    batch_size: int = 64
    lr: float = 1e-3
    max_iter: int = 30_000
    save_steps: int = 500
    model_name: str = "timbre_encoder"
    # See DiffusionTrainConfig.steps_per_dispatch.
    steps_per_dispatch: int = 1


@dataclass(frozen=True)
class ContrastiveTrainConfig(_JsonMixin):
    batch_size: int = 16
    head_lr: float = 1e-4
    text_encoder_lr: float = 1e-5
    spectrogram_encoder_lr: float = 1e-5
    head_weight_decay: float = 1e-3
    text_encoder_weight_decay: float = 1e-3
    timbre_encoder_weight_decay: float = 1e-3
    max_iter: int = 30_000
    save_steps: int = 2_000
    model_name: str = "mmm"
    # See DiffusionTrainConfig.steps_per_dispatch.
    steps_per_dispatch: int = 1


@dataclass(frozen=True)
class GANTrainConfig(_JsonMixin):
    batch_size: int = 8
    g_lr: float = 1e-4
    d_lr: float = 1e-4
    max_iter: int = 40_000
    save_steps: int = 5_000
    model_name: str = "gan"
    # See VQGANTrainConfig.compute_dtype.
    compute_dtype: str = "bfloat16"
    # See DiffusionTrainConfig.steps_per_dispatch.
    steps_per_dispatch: int = 1


# ---------------------------------------------------------------------------
# Whole-app bundle (reference: app.py:27-66)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class AppConfig(_JsonMixin):
    audio: AudioConfig = field(default_factory=AudioConfig)
    vqgan: VQGANConfig = field(default_factory=VQGANConfig)
    unet: UNetConfig = field(default_factory=UNetConfig)
    timbre: TimbreEncoderConfig = field(default_factory=TimbreEncoderConfig)
    multimodal: MultiModalConfig = field(default_factory=MultiModalConfig)
    diffusion: DiffusionConfig = field(default_factory=DiffusionConfig)
    use_pretrained_clap: bool = False
    compute_dtype: str = "bfloat16"   # dtype for conv/matmul compute on TPU

    def to_json(self) -> str:  # nested dataclasses
        return json.dumps(_asdict(self), indent=2, sort_keys=True)


# ---------------------------------------------------------------------------
# TPU-optimized U-Net preset (NOT reference-parity — own checkpoints needed)
# ---------------------------------------------------------------------------
#
# The reference channel dims (96, 96, 192, 384) force MXU tile padding: XLA
# lowers each 3x3-conv tap as a K=C_in matmul with K and N rounded up to
# 128-lane tiles, so a 96-dim conv pays for 128 and a 192-dim conv pays for
# 256 (measured ~84% of the tap-wise physical roofline — the padding, not
# inefficiency; benchmarks/RESULTS_r2.md H2). Rounding the dims up to the
# tiles the hardware already pays for gives 1.33-1.78x the representational
# capacity at those levels for the SAME MXU time. It is not expected to be
# faster per step: the dw7x7 + GroupNorm families are VPU/HBM-bound and
# scale linearly with C (H3/H4a), so step time should rise ~15-20% while
# MXU capacity rises 78% — a capacity-per-second play for models trained
# from scratch on TPU, not a drop-in speedup (H11 in RESULTS_r2.md tracks
# the measurement). Checkpoints trained with the reference dims do NOT
# load into this preset.
UNET_TPU128 = UNetConfig(
    down_dims=(128, 128, 256, 384),
    up_dims=(384, 384, 256, 128),
)

UNET_PRESETS: Dict[str, UNetConfig] = {
    "reference": UNetConfig(),
    "tpu128": UNET_TPU128,
}


# Width buckets used by pipelines so XLA compiles a small, cached set of
# programs for variable-duration generation (SURVEY.md section 7 "Dynamic
# shapes"). Widths follow width_from_duration for durations 0.25..15 s.
WIDTH_BUCKETS: Sequence[int] = (16, 24, 32, 48, 64, 96, 128, 160, 192, 224, 256)


def bucket_width(width: int, buckets: Sequence[int] = WIDTH_BUCKETS) -> int:
    """Smallest bucket >= width (cap at the largest bucket)."""
    for b in buckets:
        if b >= width:
            return b
    return buckets[-1]


def tiny_app_config() -> AppConfig:
    """Miniature geometry for API-learning runs, CPU tests, and CLI
    smoke round-trips (examples/ and tests/ share it; not a trained
    configuration)."""
    return AppConfig(
        audio=AudioConfig(
            sample_rate=4000, n_fft=128, hop_length=32, win_length=128,
            freq_resolution=64, time_resolution=32, vae_scale=4,
            channels=4, latent_height=16,
        ),
        vqgan=VQGANConfig(hidden_channels=(8, 16), attn_pos=(),
                          num_embeddings=32, num_groups=4),
        unet=UNetConfig(down_dims=(8, 8, 16, 32), up_dims=(32, 32, 16, 8),
                        label_emb_dim=16),
        diffusion=DiffusionConfig(timesteps=50, height=16, channels=4,
                                  train_width=8, max_width=32),
        compute_dtype="float32",
    )
