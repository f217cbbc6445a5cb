"""Sampler ODE-convergence on the REAL production U-Net.

DDIM (eta=0) and DPM-Solver++(2M) discretize the same probability-flow ODE,
so with ANY fixed eps model their outputs converge to a common limit as the
step count grows. tests/test_dpmpp.py pins this on a toy linear model; this
script measures it with the production ConditionedUnet (random init — the
discretization-error ordering is weight-independent), quantifying how many
DDIM steps a K-step dpmpp run is worth.

Reference solution: dense 256-step DDIM on the full 1000-step chain subset.
Errors are mean |x - ref| over the final latent, normalized by mean |ref|.

Run: cd /root/repo && python -u -m benchmarks.sampler_convergence
(CPU is fine: JAX_PLATFORMS unused; pass --cpu to force.)
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np


def main():
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    from diffusynth_tpu.configs import UNetConfig
    from diffusynth_tpu.diffusion import DiffSynthSampler
    from diffusynth_tpu.diffusion.schedule import respaced_timesteps
    from diffusynth_tpu.nn.unet import ConditionedUnet

    # Small-but-real config: production block structure, reduced dims so
    # the dense reference run stays cheap on CPU.
    cfg = UNetConfig(down_dims=(32, 32, 64, 128),
                     up_dims=(128, 128, 64, 32))
    model = ConditionedUnet(cfg)
    B, H, W = 2, 128, 16
    key = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(
        key, jnp.zeros((1, H, W, cfg.in_dim)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 512)))
    cond = jax.random.normal(jax.random.PRNGKey(1), (B, 512))

    def apply_fn(p, x, t, c):
        return model.apply(p, x, t, c)

    def run(sampler_name, steps):
        s = DiffSynthSampler(apply_fn, timesteps=1000, height=H, channels=4,
                             train_width=W, max_width=64, loop_mode="python")
        s.respace(list(respaced_timesteps(1000, steps)))
        out, _ = s.sample(params, (B, H, W, 4), jax.random.key(7),
                          condition=cond, sampler=sampler_name)
        return np.asarray(out)

    ref = run("ddim", 256)
    scale = np.abs(ref).mean()
    print(f"reference: 256-step DDIM, mean|ref| {scale:.4f}", flush=True)
    rows = []
    for n in (8, 12, 16, 20, 32, 50):
        e_d = np.abs(run("ddim", n) - ref).mean() / scale
        e_p = np.abs(run("dpmpp", n) - ref).mean() / scale
        rows.append((n, e_d, e_p))
        print(f"N={n:3d}  ddim {e_d:.5f}  dpmpp {e_p:.5f}  "
              f"(dpmpp is {e_d / e_p:.1f}x closer to the ODE limit)",
              flush=True)
    # Steps-equivalence: the smallest dpmpp N whose error beats ddim-50.
    e_ddim50 = rows[-1][1]
    for n, _, e_p in rows:
        if e_p <= e_ddim50:
            print(f"\n{n}-step dpmpp <= 50-step ddim error "
                  f"({e_p:.5f} vs {e_ddim50:.5f})", flush=True)
            break


if __name__ == "__main__":
    main()
