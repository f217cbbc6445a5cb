"""Training-loss parity vs the in-process torch reference.

The sampler chain is already pinned end-to-end (test_parity_e2e.py); this
pins the TRAINING math: with identical converted weights, inputs,
timesteps, and injected noise, our p_losses must equal the reference's
conditional_p_losses (model/diffusion.py:261-302) — q_sample included —
for every loss type the reference supports.
"""

import os

import numpy as np
import pytest

HAS_REFERENCE = os.path.isdir("/root/reference/model")
pytestmark = pytest.mark.skipif(not HAS_REFERENCE,
                                reason="reference repo not mounted")

from tests.test_parity_e2e import UNET_CFG, VQGAN_CFG  # noqa: E402


@pytest.fixture(scope="module")
def pair():
    from diffusynth_tpu.metrics.parity import build_converted_pair

    return build_converted_pair(vqgan_cfg=VQGAN_CFG, unet_cfg=UNET_CFG,
                                seed=3)


@pytest.mark.parametrize("loss_type", ["huber", "l1", "l2"])
def test_p_losses_matches_reference(pair, loss_type):
    import torch

    from model.diffusion import conditional_p_losses
    from model.diffusion_components import get_beta_schedule

    import jax.numpy as jnp

    from diffusynth_tpu.diffusion.schedule import Schedule
    from diffusynth_tpu.train.diffusion_train import p_losses

    _, t_unet, rt = pair
    T = 1000
    B, C, H, W = 2, 4, rt.config.audio.latent_height, 16
    rng = np.random.default_rng(7)
    x_start = rng.standard_normal((B, C, H, W)).astype(np.float32)
    noise = rng.standard_normal((B, C, H, W)).astype(np.float32)
    cond = rng.standard_normal(
        (B, rt.config.unet.label_emb_dim)).astype(np.float32)
    t = np.array([3, 857], np.int64)

    sqrt_ac, sqrt_1mac, _, _ = get_beta_schedule(T)
    with torch.no_grad():
        ref = conditional_p_losses(
            lambda x, tt, c: t_unet(x, tt, c),
            torch.from_numpy(x_start), torch.from_numpy(t),
            torch.from_numpy(cond), sqrt_ac, sqrt_1mac,
            noise=torch.from_numpy(noise), loss_type=loss_type,
        ).item()

    sched = Schedule.linear(T)
    consts = (jnp.asarray(sched.sqrt_alphas_cumprod, jnp.float32),
              jnp.asarray(sched.sqrt_one_minus_alphas_cumprod, jnp.float32))
    got = float(p_losses(
        lambda p, x, tt, c: rt.unet.apply(p, x, tt, c),
        rt.unet_variables, None,
        jnp.asarray(np.transpose(x_start, (0, 2, 3, 1))),
        jnp.asarray(t, jnp.int32), jnp.asarray(cond), consts,
        loss_type=loss_type,
        noise=jnp.asarray(np.transpose(noise, (0, 2, 3, 1))),
    ))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-6)
