"""Training-step device time (xplane-measured; the config-5 harness's host
wall-clock through the tunnel swings 4x on identical code).

Run: cd /root/repo && python -u -m benchmarks.micro_train
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.device_time import device_time_ms


def main():
    print("devices:", jax.devices(), flush=True)
    from diffusynth_tpu.configs import AppConfig, VQGANTrainConfig
    from diffusynth_tpu.nn import VQGANDiscriminator
    from diffusynth_tpu.pipelines import DiffuSynthRuntime
    from diffusynth_tpu.train import (
        make_diffusion_train_step, make_vqgan_train_step)

    rt = DiffuSynthRuntime(AppConfig())
    rng = np.random.default_rng(0)

    # Diffusion train step (B=8, latent 128x64).
    latents = jnp.asarray(rng.standard_normal((8, 128, 64, 4)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((8, 512)), jnp.float32)
    uncond = jnp.zeros(512)
    params = rt.unet_variables
    init_fn, step_fn = make_diffusion_train_step(rt.unet, timesteps=1000)
    opt_state = init_fn(params)
    state = [params, opt_state, jax.random.key(0)]

    def run():
        key, sub = jax.random.split(state[2])
        p, o, loss = step_fn(state[0], state[1], sub, latents, cond, uncond)
        state[0], state[1], state[2] = p, o, key
        return loss

    ms = device_time_ms(run, iters=8, warmup=2)
    print(f"diffusion train step b8: {ms:.1f} ms device "
          f"({1e3 / ms:.2f} steps/s)", flush=True)

    # VQGAN adversarial step (B=4, 512x256 spectrograms).
    disc = VQGANDiscriminator(dtype=rt.vqgan.dtype)
    data = jnp.asarray(
        np.abs(rng.standard_normal((4, 512, 256, 3))), jnp.float32)
    d_params = disc.init(jax.random.key(1), data)
    g_vars = rt.vqgan_variables
    vinit, vstep = make_vqgan_train_step(rt.vqgan, disc, VQGANTrainConfig())
    g_opt, d_opt = vinit(g_vars, d_params)
    vstate = [g_vars, d_params, g_opt, d_opt]

    def vrun():
        g, d, go, do, m = vstep(vstate[0], vstate[1], vstate[2], vstate[3],
                                data)
        vstate[0], vstate[1], vstate[2], vstate[3] = g, d, go, do
        return m["g_loss"]

    ms = device_time_ms(vrun, iters=6, warmup=2)
    print(f"vqgan train step b4: {ms:.1f} ms device "
          f"({1e3 / ms:.2f} steps/s)", flush=True)


if __name__ == "__main__":
    main()
