"""Multi-step training dispatch: wall steps/s at K steps per jitted call.

The b8 diffusion train step measures 54 ms of device time but ~430 ms of
wall per dispatch through the axon tunnel (RESULTS_r2.md config-5): the
dominant cost is per-call marshaling of the donated params+opt_state
pytree (thousands of leaf buffers), not compute. steps_per_dispatch=K
lax.scans K optimizer steps inside one call, amortizing that cost K-fold.

Run: cd /root/repo && python -u -m benchmarks.micro_multistep [K ...]
Env: MICRO_MS_FUSED=0 forces fused_kernels=False (checks the known
scanned-Mosaic-custom-call pathology, RESULTS_r2.md loop-mode check).
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from diffusynth_tpu.configs import UNetConfig
from diffusynth_tpu.nn.unet import ConditionedUnet
from diffusynth_tpu.train.diffusion_train import make_diffusion_train_step


def main():
    ks = [int(a) for a in sys.argv[1:]] or [1, 8]
    B, H, W, C = 8, 128, 64, 4
    fused = None
    if os.environ.get("MICRO_MS_FUSED") == "0":
        fused = False
    cfg = UNetConfig(fused_kernels=fused)
    unet = ConditionedUnet(cfg, dtype=jnp.bfloat16)
    print("devices:", jax.devices(), "fused_kernels:", cfg.fused_kernels,
          flush=True)

    rng = np.random.default_rng(0)
    latents = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((B, 512)), jnp.float32)
    uncond = jnp.zeros(512)
    params0 = jax.jit(unet.init)(
        jax.random.key(0), latents, jnp.zeros(B, jnp.int32), cond)

    for K in ks:
        init_fn, step_fn = make_diffusion_train_step(
            unet, timesteps=1000, steps_per_dispatch=K)
        params = jax.tree_util.tree_map(jnp.copy, params0)
        opt_state = init_fn(params)
        if K == 1:
            x, c = latents, cond
        else:
            x = jnp.broadcast_to(latents[None], (K,) + latents.shape)
            c = jnp.broadcast_to(cond[None], (K,) + cond.shape)
        key = jax.random.key(1)
        t0 = time.perf_counter()
        params, opt_state, loss = step_fn(params, opt_state, key, x, c,
                                          uncond)
        jax.block_until_ready(loss)
        compile_s = time.perf_counter() - t0

        n_dispatch = max(1, 32 // K)
        t0 = time.perf_counter()
        for i in range(n_dispatch):
            key, sub = jax.random.split(key)
            params, opt_state, loss = step_fn(params, opt_state, sub, x, c,
                                              uncond)
        jax.block_until_ready(loss)
        dt = time.perf_counter() - t0
        steps = n_dispatch * K
        print(f"K={K:3d}: {steps / dt:7.2f} steps/s wall "
              f"({dt / steps * 1e3:7.1f} ms/step; {n_dispatch} dispatches "
              f"in {dt:.2f}s; compile {compile_s:.1f}s; "
              f"loss {np.mean(np.asarray(loss)):.4f})", flush=True)


if __name__ == "__main__":
    main()
