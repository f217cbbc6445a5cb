"""Flax model zoo: VQ-GAN, conditioned diffusion U-Net, timbre encoder,
multi-modal contrastive projections, GAN heads.

All modules are NHWC (TPU conv-native) with a configurable compute dtype
(params stay float32; matmul/conv compute may run bfloat16 on the MXU).
"""

from diffusynth_tpu.nn.vq import VectorQuantizer, VectorQuantizerEMA, EMAState
from diffusynth_tpu.nn.vqgan import (
    VQGANEncoder,
    VQGANDecoder,
    VQGAN,
    VQGANDiscriminator,
)
from diffusynth_tpu.nn.unet import ConditionedUnet
from diffusynth_tpu.nn.timbre import TimbreEncoder
from diffusynth_tpu.nn.multimodal import ProjectionHead, MultiModalModel
from diffusynth_tpu.nn.gan import GANDiscriminator
