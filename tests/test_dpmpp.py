"""DPM-Solver++(2M) sampler mode.

The reference only ships DDIM/DDPM (model/DiffSynthSampler.py:296-345).
"dpmpp" is a framework extension: a second-order multistep solver for the
same probability-flow ODE that DDIM (eta=0) discretizes at first order.

Oracle: both samplers discretize the SAME ODE, so on a smooth eps model
their outputs must converge to the same limit as steps grow — a dense
(1000-step, unrespaced) DDIM run is the reference solution. The tests pin
(a) exact single-step equivalence with DDIM (the first-order DPM++ step IS
the DDIM step), (b) strictly lower error than DDIM at every step count,
(c) the empirical convergence orders (~1st for DDIM, ~2nd for DPM++).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusynth_tpu.diffusion import DiffSynthSampler
from diffusynth_tpu.diffusion.schedule import respaced_timesteps

H, C, TW = 8, 4, 8

_A = jnp.asarray(np.random.RandomState(0).randn(C, C) * 0.05, jnp.float32)


def _linear_eps(params, x, t, condition):
    """Smooth eps model, linear in x with mild t dependence (the resulting
    probability-flow ODE is well-conditioned, so discretization error —
    not stiffness — dominates)."""
    tt = (t.astype(jnp.float32) / 1000.0).reshape(-1, 1, 1, 1)
    out = jnp.einsum("bhwc,cd->bhwd", x, _A) * (1.0 + 0.3 * tt)
    if condition is not None:
        out = out + 0.01 * jnp.mean(condition, axis=-1).reshape(-1, 1, 1, 1)
    return out


def _run(sampler_name, steps=None, loop_mode="python", cfg=None):
    s = DiffSynthSampler(_linear_eps, timesteps=1000, height=H, channels=C,
                         train_width=TW, max_width=32, loop_mode=loop_mode)
    if steps is not None:
        s.respace(list(respaced_timesteps(1000, steps)))
    cond = None
    if cfg:
        s.activate_classifier_free_guidance(cfg, jnp.zeros(8))
        cond = jnp.ones((2, 8))
    out, _ = s.sample(None, (2, H, TW, C), jax.random.key(7),
                      condition=cond, sampler=sampler_name)
    return np.asarray(out)


class TestODEConvergence:
    @pytest.fixture(scope="class")
    def dense_reference(self):
        return _run("ddim")  # full 1000-step chain

    def test_dpmpp_beats_ddim_at_every_step_count(self, dense_reference):
        for n in (8, 16, 32):
            e_ddim = np.abs(_run("ddim", n) - dense_reference).mean()
            e_dpm = np.abs(_run("dpmpp", n) - dense_reference).mean()
            # measured ratios: 3.8 / 5.5 / 11.4 (see test module docstring)
            assert e_dpm < e_ddim / 2.5, (n, e_ddim, e_dpm)

    def test_convergence_orders(self, dense_reference):
        e = {(name, n): np.abs(_run(name, n) - dense_reference).mean()
             for name in ("ddim", "dpmpp") for n in (8, 32)}
        ddim_ratio = e[("ddim", 8)] / e[("ddim", 32)]
        dpm_ratio = e[("dpmpp", 8)] / e[("dpmpp", 32)]
        # 4x the steps: 1st order -> ~4x, 2nd order -> ~16x (the mandatory
        # first-order final step dilutes it; measured 3.4 and 10.0).
        assert 2.0 < ddim_ratio < 6.0, ddim_ratio
        assert dpm_ratio > 6.0, dpm_ratio
        assert dpm_ratio > 2.0 * ddim_ratio, (ddim_ratio, dpm_ratio)


def test_single_step_equals_ddim():
    """A 1-step chain never leaves first order -> exactly the DDIM step."""
    a = _run("ddim", 1)
    b = _run("dpmpp", 1)
    np.testing.assert_array_equal(a, b)


def test_first_step_matches_ddim_prefix():
    """The first executed step (no x0 history yet) is first-order == DDIM."""
    s_d = DiffSynthSampler(_linear_eps, timesteps=1000, height=H, channels=C,
                           train_width=TW, max_width=32, loop_mode="python")
    s_p = DiffSynthSampler(_linear_eps, timesteps=1000, height=H, channels=C,
                           train_width=TW, max_width=32, loop_mode="python")
    for s in (s_d, s_p):
        s.respace(list(respaced_timesteps(1000, 6)))
    key = jax.random.key(3)
    traj_d, _ = s_d.sample(None, (2, H, TW, C), key, sampler="ddim",
                           return_trajectory=True)
    traj_p, _ = s_p.sample(None, (2, H, TW, C), key, sampler="dpmpp",
                           return_trajectory=True)
    np.testing.assert_allclose(np.asarray(traj_d)[0], np.asarray(traj_p)[0],
                               rtol=0, atol=1e-6)
    # ...and the second steps genuinely differ (the 2M correction kicked in).
    assert np.abs(np.asarray(traj_d)[1] - np.asarray(traj_p)[1]).max() > 1e-4


def test_cfg_and_finite():
    out = _run("dpmpp", 8, cfg=3.0)
    assert np.isfinite(out).all()


def test_img2img_and_inpaint_modes_run():
    s = DiffSynthSampler(_linear_eps, timesteps=100, height=H, channels=C,
                         train_width=TW, max_width=32, loop_mode="python")
    s.respace(list(respaced_timesteps(100, 8)))
    key = jax.random.key(0)
    guide = jnp.full((2, H, TW, C), 0.5)
    out, _ = s.img_guided_sample(None, (2, H, TW, C), key, 0.75, guide,
                                 sampler="dpmpp")
    assert np.isfinite(np.asarray(out)).all()
    out, _ = s.inpaint_sample(None, (2, H, 24, C), key, 1.0, guide,
                              use_dynamic_mask=True, sampler="dpmpp")
    assert out.shape == (2, H, 24, C)
    assert np.isfinite(np.asarray(out)).all()
