"""Training: data loading, optax train steps (jit + DP sharding), orbax
checkpoints, and loops for all four models (VQ-GAN, diffusion U-Net, timbre
encoder, multimodal contrastive) plus the one-shot GAN.

The reference trains each model in a Colab notebook with hard-coded dicts
(SURVEY.md section 2 #26); here each model has a pure train-step factory
(fully jitted, donated buffers) and a host loop with checkpointing and
metric logging.
"""

from diffusynth_tpu.train.data import (
    NSynthDataloader,
    NSynthDataset,
    SyntheticNSynthDataset,
    data_iterator,
    get_nsynth_dataloader,
)
from diffusynth_tpu.train.checkpoints import Checkpointer
from diffusynth_tpu.train.diffusion_train import (
    make_diffusion_train_step,
    train_diffusion_model,
)
from diffusynth_tpu.train.lora import (
    apply_lora,
    init_lora,
    make_lora_train_step,
    merge_lora,
    train_diffusion_lora,
)
from diffusynth_tpu.train.vqgan_train import (
    make_vqgan_train_step,
    train_vqgan,
)
from diffusynth_tpu.train.timbre_train import (
    make_timbre_train_step,
    train_timbre_encoder,
)
from diffusynth_tpu.train.contrastive_train import (
    make_contrastive_train_step,
    train_multimodal,
)
from diffusynth_tpu.train.gan_train import make_gan_train_steps, train_gan
