"""DP training scaling curve on the virtual-CPU mesh (VERDICT r1 #6).

Weak scaling of the diffusion train step: fixed PER-DEVICE batch, devices
in {1, 2, 4, 8} on an 8-virtual-CPU-device platform — the standard way to
validate TPU sharding structure without a slice (SURVEY.md section 4). CPU
step times only establish the SCALING SHAPE (the collectives' cost share);
absolute per-step device time on the v5e is measured by
benchmarks/micro_train.py.

Also asserts the DP loss at matched global batch equals the single-device
loss (the sharded program is the same math).

Self-configuring: re-execs itself with the 8-device CPU env when needed.

Run: cd /root/repo && python -u -m benchmarks.dp_scaling
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

import numpy as np

PER_DEVICE_BATCH = 8
STEPS = 8


def _body():
    import jax
    import jax.numpy as jnp

    from diffusynth_tpu.configs import UNetConfig
    from diffusynth_tpu.nn.unet import ConditionedUnet
    from diffusynth_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from diffusynth_tpu.train.diffusion_train import make_diffusion_train_step

    assert jax.device_count() >= 8, jax.device_count()
    config = UNetConfig(down_dims=(16, 16, 32, 64), up_dims=(64, 64, 32, 16),
                        label_emb_dim=64)
    unet = ConditionedUnet(config)
    H, W, C = 32, 16, 4
    rng = np.random.default_rng(0)

    def run(n_dev: int):
        mesh = make_mesh(n_dev)
        B = PER_DEVICE_BATCH * n_dev
        latents = rng.standard_normal((B, H, W, C)).astype(np.float32)
        cond = rng.standard_normal((B, config.label_emb_dim)).astype(
            np.float32)
        params = unet.init(jax.random.key(0), jnp.asarray(latents[:1]),
                           jnp.zeros(1, jnp.int32), jnp.asarray(cond[:1]))
        init_fn, step_fn = make_diffusion_train_step(unet, timesteps=100,
                                                     lr=1e-4)
        opt_state = init_fn(params)
        params = replicate(params, mesh)
        opt_state = replicate(opt_state, mesh)
        lat_s = shard_batch(latents, mesh)
        cond_s = shard_batch(cond, mesh)
        uncond = replicate(jnp.zeros(config.label_emb_dim), mesh)
        # compile + warmup
        params, opt_state, loss = step_fn(params, opt_state,
                                          jax.random.key(1), lat_s, cond_s,
                                          uncond)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for i in range(STEPS):
            params, opt_state, loss = step_fn(params, opt_state,
                                              jax.random.key(2 + i), lat_s,
                                              cond_s, uncond)
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / STEPS
        return dt, float(loss)

    # NOTE on interpretation: virtual CPU devices SHARE one physical CPU,
    # so wall-clock cannot improve with device count — the meaningful
    # number is per-SAMPLE time: if the sharded program added collective
    # or partitioning overhead, per-sample time would grow with devices.
    print(f"\nWeak scaling, per-device batch {PER_DEVICE_BATCH}, "
          f"tiny config, {STEPS} timed steps "
          f"(virtual devices; fixed total compute):")
    base = None
    for n in (1, 2, 4, 8):
        dt, loss = run(n)
        per_sample = dt * 1e3 / (PER_DEVICE_BATCH * n)
        base = base or per_sample
        print(f"  devices={n}: {dt*1e3:8.1f} ms/step  "
              f"global batch {PER_DEVICE_BATCH*n:3d}  "
              f"{per_sample:6.1f} ms/sample  "
              f"sharding overhead {per_sample/base - 1.0:+5.1%}  "
              f"loss {loss:.4f}")

    # Matched-global-batch loss equality: 8 devices vs 1 device, batch 16.
    def run_matched(n_dev: int):
        mesh = make_mesh(n_dev)
        B = 16
        latents = rng.standard_normal((B, H, W, C)).astype(np.float32)
        cond = rng.standard_normal((B, config.label_emb_dim)).astype(
            np.float32)
        params = unet.init(jax.random.key(0), jnp.asarray(latents[:1]),
                           jnp.zeros(1, jnp.int32), jnp.asarray(cond[:1]))
        init_fn, step_fn = make_diffusion_train_step(unet, timesteps=100,
                                                     lr=1e-4)
        opt_state = init_fn(params)
        params = replicate(params, mesh)
        opt_state = replicate(opt_state, mesh)
        losses = []
        for i in range(4):
            params, opt_state, loss = step_fn(
                params, opt_state, jax.random.key(100 + i),
                shard_batch(latents, mesh), shard_batch(cond, mesh),
                replicate(np.zeros(config.label_emb_dim, np.float32), mesh))
            losses.append(float(loss))
        return losses

    rng = np.random.default_rng(7)
    l1 = run_matched(1)
    rng = np.random.default_rng(7)
    l8 = run_matched(8)
    print(f"\nLoss trajectory, global batch 16, 4 steps:")
    print(f"  1 device : {['%.6f' % x for x in l1]}")
    print(f"  8 devices: {['%.6f' % x for x in l8]}")
    diff = max(abs(a - b) for a, b in zip(l1, l8))
    print(f"  max |diff| = {diff:.2e} "
          f"({'OK' if diff < 1e-4 else 'DIVERGED'})")
    if diff >= 1e-4:
        # The docstring promises an assertion: a sharding regression must
        # fail the process, not just print, so automation can't miss it.
        raise SystemExit(f"DP loss trajectory DIVERGED: max |diff| {diff:.2e}")


def main():
    import jax

    if jax.device_count() >= 8:
        _body()
        return
    env = dict(os.environ)
    from __graft_entry__ import _force_device_count_flags
    env["XLA_FLAGS"] = _force_device_count_flags(env.get("XLA_FLAGS", ""), 8)
    env["JAX_PLATFORMS"] = "cpu"
    child = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
             "from benchmarks.dp_scaling import _body; _body()")
    sys.exit(subprocess.run([sys.executable, "-c", child], env=env,
                            cwd=os.path.dirname(os.path.dirname(
                                os.path.abspath(__file__)))).returncode)


if __name__ == "__main__":
    main()
