"""Custom Pallas TPU kernels for the hot ops, with jnp reference fallbacks.

- linear_attention: blocked MXU formulation (default) + streaming Pallas
  kernel (opt-in) for the U-Net's Katharopoulos-style attention.
- group_norm: single-VMEM-residency GroupNorm(1) forward.
- fused_block: the whole post-depthwise ConvNeXt body in one kernel
  (GN -> conv3x3 -> GELU -> GN -> conv3x3 -> +residual), with
  zero-padded-channel support and external GN stats.
- attention_site: the whole PreNorm/attention/out-proj/GN/residual site
  in one kernel.
"""

from diffusynth_tpu.ops.attention_site import (
    attention_site,
    attention_site_reference,
)
from diffusynth_tpu.ops.fused_block import (
    convnext_body,
    convnext_body_reference,
)
from diffusynth_tpu.ops.group_norm import (
    fused_group_norm,
    group_norm_auto,
    group_norm_reference,
)
from diffusynth_tpu.ops.linear_attention import (
    linear_attention_jnp,
    linear_attention_pallas,
    linear_cross_attention,
)
