"""Multi-chip scaling: device meshes and sharding helpers.

The reference is strictly single-device (SURVEY.md section 2.3); scaling here
is new design: a 1-D data mesh over ICI, batch-axis sharding via
NamedSharding, XLA inserting the collectives (grad psum in training,
all_gather-free batched note rendering at inference).
"""

from diffusynth_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
