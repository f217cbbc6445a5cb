"""Training-step device time (xplane-measured; the config-5 harness's host
wall-clock through the tunnel swings 4x on identical code).

Sweeps the train-config compute dtype (bfloat16 default vs float32, the
reference's numerics) for the diffusion and VQGAN steps — params and
optimizer state are float32 in both cases (configs.VQGANTrainConfig
.compute_dtype).

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
    from diffusynth_tpu.nn.unet import ConditionedUnet
    from diffusynth_tpu.nn.vqgan import VQGAN
    from diffusynth_tpu.pipelines import DiffuSynthRuntime
    from diffusynth_tpu.train import (
        make_diffusion_train_step, make_vqgan_train_step)

    rt = DiffuSynthRuntime(AppConfig())
    rng = np.random.default_rng(0)

    # Diffusion train step (B=8, latent 128x64), bf16 vs f32 compute.
    latents = jnp.asarray(rng.standard_normal((8, 128, 64, 4)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((8, 512)), jnp.float32)
    uncond = jnp.zeros(512)
    for name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        unet = ConditionedUnet(rt.config.unet, dtype=dt)
        # Fresh copy per variant: the train step DONATES params/opt_state,
        # so the runtime's arrays are consumed by the first variant's runs.
        params = jax.tree.map(jnp.array, rt.unet_variables)
        init_fn, step_fn = make_diffusion_train_step(unet, timesteps=1000)
        opt_state = init_fn(params)
        state = [params, opt_state, jax.random.key(0)]

        def run():
            key, sub = jax.random.split(state[2])
            p, o, loss = step_fn(state[0], state[1], sub, latents, cond,
                                 uncond)
            state[0], state[1], state[2] = p, o, key
            return loss

        ms = device_time_ms(run, iters=8, warmup=2)
        print(f"diffusion train step b8 [{name}]: {ms:.1f} ms device "
              f"({1e3 / ms:.2f} steps/s)", flush=True)

    # VQGAN adversarial step (B=4, 512x256 spectrograms), bf16 vs f32.
    data = jnp.asarray(
        np.abs(rng.standard_normal((4, 512, 256, 3))), jnp.float32)
    for name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        vqgan = VQGAN(rt.config.vqgan, dtype=dt)
        disc = VQGANDiscriminator(dtype=dt)
        d_params = jax.jit(disc.init)(jax.random.key(1), data)
        g_vars = jax.tree.map(jnp.array, rt.vqgan_variables)  # donated below
        vinit, vstep = make_vqgan_train_step(vqgan, disc, VQGANTrainConfig())
        g_opt, d_opt = vinit(g_vars, d_params)
        vstate = [g_vars, d_params, g_opt, d_opt]

        def vrun():
            g, d, go, do, m = vstep(vstate[0], vstate[1], vstate[2],
                                    vstate[3], data)
            vstate[0], vstate[1], vstate[2], vstate[3] = g, d, go, do
            return m["g_loss"]

        ms = device_time_ms(vrun, iters=6, warmup=2)
        print(f"vqgan train step b4 [{name}]: {ms:.1f} ms device "
              f"({1e3 / ms:.2f} steps/s)", flush=True)


if __name__ == "__main__":
    main()
