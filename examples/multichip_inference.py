"""Data-parallel batched generation over a device mesh.

  # 8 virtual CPU devices (no TPU slice needed):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/multichip_inference.py --tiny --cpu
  # On a real slice the same code shards over all attached chips.

Params are replicated, the batch axis is sharded (parallel/mesh.py); XLA
inserts the collectives. The same pattern serves training — see
`python -m diffusynth_tpu.train.run --mesh` and __graft_entry__.py's
dryrun_multichip for the full DP train-step example.
"""

from __future__ import annotations

import numpy as np

from _common import base_parser, make_runtime, save_outputs


def main():
    p = base_parser(__doc__)
    p.add_argument("--prompt", default="a bright synthetic lead")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--steps", type=int, default=10)
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from diffusynth_tpu.parallel import make_mesh
    from diffusynth_tpu.pipelines import Text2SoundPipeline

    n = jax.device_count()
    if args.batch % n:
        raise SystemExit(f"--batch {args.batch} must divide by the "
                         f"{n} available devices")
    runtime = make_runtime(args, mesh=make_mesh(n))

    pipe = Text2SoundPipeline(runtime)
    result = pipe(args.prompt, "noise", batchsize=args.batch,
                  duration_sec=1.0 if args.tiny else 3.0,
                  steps=args.steps, cfg=6.0, seed=0)
    print(f"{n} devices, batch {args.batch}: "
          f"latents {result.latents.shape} sharded as "
          f"{getattr(result.latents, 'sharding', None)}")
    save_outputs(args.out, "multichip", result)


if __name__ == "__main__":
    main()
