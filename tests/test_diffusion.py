"""Diffusion subsystem tests.

Includes *behavioral parity* tests that run the reference PyTorch
DiffSynthSampler (imported from /root/reference, never copied) against our
scan-based sampler with an identical dummy denoiser and identical initial
noise, asserting the final latents match to float tolerance.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusynth_tpu.diffusion import (
    DiffSynthSampler,
    Schedule,
    dynamic_mask_profiles,
    repeat_indices,
    respaced_timesteps,
)
from diffusynth_tpu.diffusion.noise import build_noise, linear_interpolation_noise
from diffusynth_tpu.diffusion.schedule import q_sample

REFERENCE = "/root/reference"
HAS_REFERENCE = os.path.isdir(os.path.join(REFERENCE, "model"))

H, C, TRAIN_W = 16, 4, 16  # tiny geometry for speed


# ---------------------------------------------------------------------------
# Schedule
# ---------------------------------------------------------------------------

class TestSchedule:
    def test_linear_matches_reference_formulas(self):
        s = Schedule.linear(1000)
        betas = np.linspace(1e-4, 0.02, 1000)
        ac = np.cumprod(1 - betas)
        np.testing.assert_allclose(s.betas, betas)
        np.testing.assert_allclose(s.alphas_cumprod, ac)
        np.testing.assert_allclose(s.sqrt_alphas_cumprod, np.sqrt(ac))
        np.testing.assert_allclose(
            s.posterior_variance,
            betas * (1 - np.append(1.0, ac[:-1])) / (1 - ac),
        )

    def test_respace_preserves_alphas_cumprod(self):
        s = Schedule.linear(1000)
        use = respaced_timesteps(1000, 20)
        r = s.respace(use)
        assert r.num_timesteps == 20
        np.testing.assert_allclose(
            r.alphas_cumprod, s.alphas_cumprod[use], rtol=1e-10
        )
        np.testing.assert_array_equal(r.timestep_map, use)

    def test_q_sample_endpoints(self):
        s = Schedule.linear(1000)
        x = jnp.ones((2, 4, 4, 1))
        noise = jnp.full((2, 4, 4, 1), 2.0)
        near_clean = q_sample(x, jnp.array([0, 0]), s, noise)
        # t=0: mostly signal.
        assert abs(float(near_clean[0, 0, 0, 0]) - 1.0) < 0.05
        near_noise = q_sample(x, jnp.array([999, 999]), s, noise)
        # t=999: mostly noise.
        assert abs(float(near_noise[0, 0, 0, 0]) - 2.0) < 0.4


# ---------------------------------------------------------------------------
# Repeat-noise index map vs a direct slicing port of the reference logic
# ---------------------------------------------------------------------------

def _reference_repeat(template_w: np.ndarray, width: int, train_width: int):
    """Direct numpy transliteration of DiffSynthSampler.py:97-167 acting on a
    (train_width,) index array, used as the oracle."""
    release = int(train_width / 4)
    first_w = train_width - release
    first = template_w[:first_w]
    rel = template_w[-release:]
    if width <= train_width:
        head_w = int((width - release) / 2)
        tail_w = width - release - head_w
        parts = [first[:head_w], first[first_w - tail_w:], rel]
    else:
        repeats = (width - release) // first_w
        extra = (width - release) % first_w
        rh = int(first_w / 2)
        rt = first_w - rh
        ms = (first_w - extra) // 2
        parts = ([first[:rh]] * repeats + [first[ms:ms + extra]]
                 + [first[first_w - rt:]] * repeats + [rel])
    points = [0]
    for p in parts[:-1]:
        points.append(points[-1] + len(p))
    return np.concatenate(parts), points


class TestRepeatNoise:
    @pytest.mark.parametrize("width", [16, 20, 32, 48, 64, 80, 100, 128, 256])
    def test_matches_reference_logic(self, width):
        idx, points = repeat_indices(width, 64)
        oracle_idx, oracle_points = _reference_repeat(np.arange(64), width, 64)
        np.testing.assert_array_equal(idx, oracle_idx)
        assert points == oracle_points

    def test_identity_at_train_width(self):
        idx, _ = repeat_indices(64, 64)
        np.testing.assert_array_equal(idx, np.arange(64))

    def test_build_noise_shapes_and_release_tail(self):
        key = jax.random.key(0)
        noise, points = build_noise(key, 2, H, 40, C, train_width=TRAIN_W)
        assert noise.shape == (2, H, 40, C)
        # Release tail equals the template's last quarter.
        tmpl = jax.random.normal(key, (2, H, TRAIN_W, C))
        np.testing.assert_allclose(
            np.asarray(noise[:, :, -4:, :]), np.asarray(tmpl[:, :, -4:, :])
        )

    def test_non_repeat_strategy(self):
        key = jax.random.key(1)
        noise, points = build_noise(
            key, 2, H, 40, C, strategy="non_repeat", max_width=64
        )
        assert noise.shape == (2, H, 40, C)
        assert points is None

    def test_linear_interpolation_noise_endpoints(self):
        key = jax.random.key(2)
        a = jnp.zeros((H, 24, C))
        b = jnp.ones((H, 24, C))
        noise = linear_interpolation_noise(key, (5, H, 24, C),
                                           first_endpoint=a, second_endpoint=b)
        np.testing.assert_allclose(np.asarray(noise[0]), 0.0)
        np.testing.assert_allclose(np.asarray(noise[-1]), 1.0)
        np.testing.assert_allclose(np.asarray(noise[2]), 0.5)


# ---------------------------------------------------------------------------
# Dynamic masks vs a direct port of the reference mask builder
# ---------------------------------------------------------------------------

def _reference_dynamic_masks(n_masks, width, concat_points, train_width,
                             mask_flexivity):
    """Direct numpy transliteration of DiffSynthSampler.py:365-422 (oracle),
    returning masks in CONSUMPTION order (build order, see sampler docs)."""
    release = int(train_width / 4)
    fl = [concat_points[i + 1] - concat_points[i]
          for i in range(len(concat_points) - 1)]
    n_guid = int(n_masks * mask_flexivity)
    n_free = n_masks - n_guid
    masks = []
    for i in range(n_guid):
        m = np.zeros(width, dtype=np.float32)
        m[-release:] = 1.0
        for fi in range(len(fl)):
            L = int((n_guid - 1 - i) / (n_guid - 1) * fl[fi])
            if fi == 0:
                m[:L] = 1.0
            elif fi == len(fl) - 1:
                if L != 0:
                    m[-L - release:] = 1.0
            else:
                st = int((fl[fi] - L) / 2)
                m[concat_points[fi] + st:concat_points[fi] + st + L] = 1.0
        masks.append(m)
    for _ in range(n_free):
        m = np.zeros(width, dtype=np.float32)
        m[-release:] = 1.0
        masks.append(m)
    return np.stack(masks)


class TestDynamicMasks:
    @pytest.mark.parametrize("width,flex", [(20, 0.8), (64, 1.0), (80, 0.5)])
    def test_matches_reference_logic(self, width, flex):
        _, points = repeat_indices(width, 64)
        ours = dynamic_mask_profiles(10, width, points, 64, flex)
        oracle = _reference_dynamic_masks(10, width, points, 64, flex)
        np.testing.assert_array_equal(ours, oracle)

    def test_first_mask_fully_frozen_last_release_only(self):
        _, points = repeat_indices(48, 64)
        m = dynamic_mask_profiles(8, 48, points, 64, 1.0)
        assert m[0].sum() == 48            # fully frozen at the start
        assert m[-1].sum() == 16           # only the release tail at the end


# ---------------------------------------------------------------------------
# Sampler integration with a tiny analytic denoiser
# ---------------------------------------------------------------------------

def _dummy_apply(params, x, t, condition):
    """Deterministic toy denoiser: eps_hat = a*x + b*t (+ c*mean(cond))."""
    out = 0.1 * x + 0.001 * t.astype(jnp.float32).reshape(-1, 1, 1, 1)
    if condition is not None:
        out = out + 0.01 * jnp.mean(condition, axis=-1).reshape(-1, 1, 1, 1)
    return out


def _make_sampler(steps=None, cfg=None):
    s = DiffSynthSampler(_dummy_apply, timesteps=100, height=H, channels=C,
                         train_width=TRAIN_W, max_width=64)
    if steps:
        s.respace(list(respaced_timesteps(100, steps)))
    if cfg:
        s.activate_classifier_free_guidance(cfg, jnp.zeros(8))
    return s


class TestSamplerSmoke:
    def test_sample_shapes_and_determinism(self):
        s = _make_sampler(steps=5)
        shape = (2, H, 24, C)
        key = jax.random.key(0)
        out1, noise1 = s.sample(None, shape, key)
        out2, noise2 = s.sample(None, shape, key)
        assert out1.shape == shape
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))
        np.testing.assert_allclose(np.asarray(noise1), np.asarray(noise2))

    def test_cfg_changes_output(self):
        shape = (1, H, TRAIN_W, C)
        cond = jnp.ones((1, 8))
        key = jax.random.key(1)
        base, _ = _make_sampler(steps=5).sample(None, shape, key, condition=cond)
        guided, _ = _make_sampler(steps=5, cfg=3.0).sample(
            None, shape, key, condition=cond
        )
        assert not np.allclose(np.asarray(base), np.asarray(guided))

    def test_cfg_prefix_share_equivalence(self, monkeypatch):
        """An apply advertising supports_cfg_dual gets (x at B, cond at 2B)
        and must produce the same guided sample as the plain CFG
        batch-double; DIFFUSYNTH_CFG_PREFIX_SHARE=0 opts out."""

        calls = {"dual": 0}

        def dual_apply(params, x, t, condition, cfg_dual=False):
            if cfg_dual:
                calls["dual"] += 1
                assert condition.shape[0] == 2 * x.shape[0]
                x = jnp.concatenate([x, x], axis=0)
                t = jnp.concatenate([t, t], axis=0)
            return _dummy_apply(params, x, t, condition)

        dual_apply.supports_cfg_dual = True

        def make(apply_fn):
            s = DiffSynthSampler(apply_fn, timesteps=100, height=H,
                                 channels=C, train_width=TRAIN_W,
                                 max_width=64)
            s.respace(list(respaced_timesteps(100, 5)))
            s.activate_classifier_free_guidance(3.0, jnp.zeros(8))
            return s

        shape = (2, H, TRAIN_W, C)
        cond = jnp.ones((2, 8))
        key = jax.random.key(3)
        base, _ = make(_dummy_apply).sample(None, shape, key, condition=cond)
        dual, _ = make(dual_apply).sample(None, shape, key, condition=cond)
        assert calls["dual"] > 0, "cfg_dual path did not engage"
        np.testing.assert_allclose(np.asarray(dual), np.asarray(base),
                                   atol=1e-6)

        monkeypatch.setenv("DIFFUSYNTH_CFG_PREFIX_SHARE", "0")
        calls["dual"] = 0
        off, _ = make(dual_apply).sample(None, shape, key, condition=cond)
        assert calls["dual"] == 0, "opt-out env var ignored"
        np.testing.assert_allclose(np.asarray(off), np.asarray(base),
                                   atol=1e-6)

    def test_per_sample_cfg_matches_scalar_runs(self):
        """A (B,) cfg array + (B, D) uncond batch must reproduce, per
        sample, the scalar-cfg runs — the serving layer relies on this to
        coalesce requests with different cfg / negative prompts into one
        batched launch."""
        cond = jnp.stack([jnp.ones(8), 2.0 * jnp.ones(8)])
        uncond = jnp.stack([jnp.zeros(8), 0.5 * jnp.ones(8)])
        tmpl = jax.random.normal(jax.random.key(7), (2, H, TRAIN_W, C))
        s = _make_sampler(steps=5)
        s.activate_classifier_free_guidance(jnp.asarray([2.0, 5.0]), uncond)
        batched, _ = s.sample(None, (2, H, TRAIN_W, C), jax.random.key(0),
                              condition=cond, initial_noise=tmpl)
        singles = []
        for i, scale in enumerate((2.0, 5.0)):
            si = _make_sampler(steps=5)
            si.activate_classifier_free_guidance(scale, uncond[i])
            out, _ = si.sample(None, (1, H, TRAIN_W, C), jax.random.key(0),
                               condition=cond[i:i + 1],
                               initial_noise=tmpl[i:i + 1])
            singles.append(out)
        np.testing.assert_allclose(np.asarray(batched),
                                   np.asarray(jnp.concatenate(singles)),
                                   atol=1e-5)

    def test_cfg_scale_one_entry_equals_conditioned(self):
        """eps_u + 1.0 * (eps_c - eps_u) == eps_c: a per-sample scale of
        exactly 1.0 reduces to the plain conditioned prediction."""
        cond = jnp.ones((1, 8))
        tmpl = jax.random.normal(jax.random.key(8), (1, H, TRAIN_W, C))
        s = _make_sampler(steps=5)
        s.activate_classifier_free_guidance(jnp.asarray([1.0]), jnp.zeros(8))
        guided, _ = s.sample(None, (1, H, TRAIN_W, C), jax.random.key(0),
                             condition=cond, initial_noise=tmpl)
        plain, _ = _make_sampler(steps=5).sample(
            None, (1, H, TRAIN_W, C), jax.random.key(0), condition=cond,
            initial_noise=tmpl)
        np.testing.assert_allclose(np.asarray(guided), np.asarray(plain),
                                   atol=1e-5)

    def test_cfg_change_reuses_compiled_loop(self):
        """The guidance scale is a traced input, not part of the program
        signature: changing the cfg slider must NOT recompile (multi-minute
        through the remote compiler)."""
        s = _make_sampler(steps=5)
        s.activate_classifier_free_guidance(3.0, jnp.zeros(8))
        shape = (1, H, TRAIN_W, C)
        cond = jnp.ones((1, 8))
        a, _ = s.sample(None, shape, jax.random.key(1), condition=cond)
        assert len(s._loop_cache) == 1
        s.activate_classifier_free_guidance(7.0, jnp.zeros(8))
        b, _ = s.sample(None, shape, jax.random.key(1), condition=cond)
        assert len(s._loop_cache) == 1, "cfg change must reuse the program"
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_ddpm_vs_ddim(self):
        s = _make_sampler(steps=5)
        shape = (1, H, TRAIN_W, C)
        key = jax.random.key(2)
        a, _ = s.sample(None, shape, key, sampler="ddim")
        b, _ = s.sample(None, shape, key, sampler="ddpm")
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_img_guided(self):
        s = _make_sampler(steps=10)
        shape = (1, H, TRAIN_W, C)
        guide = jnp.ones(shape) * 0.5
        out, _ = s.img_guided_sample(None, shape, jax.random.key(3),
                                     noising_strength=0.5, guide_img=guide)
        assert out.shape == shape

    def test_inpaint_static_mask_freezes_region(self):
        s = _make_sampler(steps=10)
        shape = (1, H, TRAIN_W, C)
        guide = jnp.ones(shape) * 0.5
        mask = jnp.zeros((1, H, TRAIN_W, 1)).at[:, :, :8, :].set(1.0)
        out, _ = s.inpaint_sample(None, shape, jax.random.key(4),
                                  noising_strength=1.0, guide_img=guide,
                                  mask=mask)
        # Frozen columns must equal the guide exactly (final blend uses the
        # raw guide at t == 0).
        np.testing.assert_allclose(np.asarray(out[:, :, :8, :]), 0.5, atol=1e-6)

    def test_inpaint_dynamic_mask_and_guide_expansion(self):
        s = _make_sampler(steps=10)
        width = 24
        guide = jnp.ones((1, H, TRAIN_W, C)) * 0.5  # train-width guide
        out, _ = s.inpaint_sample(None, (1, H, width, C), jax.random.key(5),
                                  noising_strength=1.0, guide_img=guide,
                                  use_dynamic_mask=True, mask_flexivity=1.0)
        assert out.shape == (1, H, width, C)
        # Release tail (last train_width/4 columns) stays frozen to the guide.
        np.testing.assert_allclose(
            np.asarray(out[:, :, -TRAIN_W // 4:, :]), 0.5, atol=1e-6
        )

    def test_interpolate(self):
        s = _make_sampler(steps=5)
        shape = (3, H, TRAIN_W, C)
        a = jnp.zeros((H, TRAIN_W, C))
        b = jnp.ones((H, TRAIN_W, C))
        out, _ = s.interpolate(None, shape, jax.random.key(6),
                               first_endpoint=a, second_endpoint=b)
        assert out.shape == shape

    def test_trajectory(self):
        s = _make_sampler(steps=5)
        shape = (1, H, TRAIN_W, C)
        traj, _ = s.sample(None, shape, jax.random.key(7),
                           return_trajectory=True)
        assert traj.shape == (5,) + shape


# ---------------------------------------------------------------------------
# Behavioral parity vs the reference PyTorch sampler
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not HAS_REFERENCE, reason="reference repo not mounted")
class TestReferenceParity:
    """Run the actual reference DiffSynthSampler as an oracle."""

    @classmethod
    def setup_class(cls):
        import torch  # noqa: F401
        sys.path.insert(0, REFERENCE)
        from model.DiffSynthSampler import DiffSynthSampler as RefSampler
        cls.RefSampler = RefSampler
        cls.torch = torch

    def _torch_dummy(self):
        torch = self.torch

        def model(x, t, condition=None):
            out = 0.1 * x + 0.001 * t.float().reshape(-1, 1, 1, 1)
            if condition is not None:
                out = out + 0.01 * condition.mean(dim=-1).reshape(-1, 1, 1, 1)
            return out

        return model

    def _run_pair(self, width, steps, cfg=None, mode="sample",
                  strength=1.0, flex=1.0):
        torch = self.torch
        rng = np.random.default_rng(0)
        B = 2
        template = rng.standard_normal((B, C, H, TRAIN_W)).astype(np.float32)

        # --- reference run (NCHW) ---
        ref = self.RefSampler(100, device="cpu", mute=True, height=H,
                              max_batchsize=B, max_width=64, channels=C,
                              train_width=TRAIN_W, noise_strategy="repeat")
        ref.respace(list(np.linspace(0, 99, steps, dtype=np.int32)))
        cond_t = torch.ones(B, 8)
        if cfg:
            ref.activate_classifier_free_guidance(cfg, torch.zeros(8))
        shape_ref = (B, C, H, width)
        if mode == "sample":
            imgs, _ = ref.sample(self._torch_dummy(), shape_ref,
                                 return_tensor=True, condition=cond_t,
                                 initial_noise=torch.from_numpy(template))
        elif mode == "img2img":
            guide = torch.full((B, C, H, TRAIN_W), 0.5)
            imgs, _ = ref.img_guided_sample(
                self._torch_dummy(), shape_ref, strength, guide,
                return_tensor=True, condition=cond_t,
                initial_noise=torch.from_numpy(template))
        else:  # inpaint with dynamic mask
            guide = torch.full((B, C, H, TRAIN_W), 0.5)
            imgs, _ = ref.inpaint_sample(
                self._torch_dummy(), shape_ref, strength, guide, None,
                return_tensor=True, condition=cond_t,
                initial_noise=torch.from_numpy(template),
                use_dynamic_mask=True, mask_flexivity=flex)
        ref_out = imgs[-1].numpy()

        # --- our run (NHWC) ---
        ours = DiffSynthSampler(_dummy_apply, timesteps=100, height=H,
                                channels=C, train_width=TRAIN_W, max_width=64)
        ours.respace(list(np.linspace(0, 99, steps, dtype=np.int32)))
        if cfg:
            ours.activate_classifier_free_guidance(cfg, jnp.zeros(8))
        tmpl_nhwc = jnp.asarray(np.transpose(template, (0, 2, 3, 1)))
        shape = (B, H, width, C)
        cond = jnp.ones((B, 8))
        if mode == "sample":
            out, _ = ours.sample(None, shape, jax.random.key(0),
                                 condition=cond, initial_noise=tmpl_nhwc)
        elif mode == "img2img":
            guide_j = jnp.full((B, H, TRAIN_W, C), 0.5)
            out, _ = ours.img_guided_sample(
                None, shape, jax.random.key(0), strength, guide_j,
                condition=cond, initial_noise=tmpl_nhwc)
        else:
            guide_j = jnp.full((B, H, TRAIN_W, C), 0.5)
            out, _ = ours.inpaint_sample(
                None, shape, jax.random.key(0), strength, guide_j,
                condition=cond, initial_noise=tmpl_nhwc,
                use_dynamic_mask=True, mask_flexivity=flex)
        ours_out = np.transpose(np.asarray(out), (0, 3, 1, 2))
        np.testing.assert_allclose(ours_out, ref_out, atol=2e-4, rtol=1e-4)

    @pytest.mark.parametrize("width", [TRAIN_W, 24, 40])
    def test_sample_parity(self, width):
        self._run_pair(width, steps=8)

    def test_sample_parity_with_cfg(self):
        self._run_pair(TRAIN_W, steps=8, cfg=3.0)

    def test_img2img_parity(self):
        self._run_pair(TRAIN_W, steps=10, mode="img2img", strength=0.5)

    def test_inpaint_dynamic_parity(self):
        self._run_pair(24, steps=10, mode="inpaint", strength=1.0, flex=1.0)

    def test_inpaint_dynamic_parity_partial_flex(self):
        self._run_pair(24, steps=10, mode="inpaint", strength=1.0, flex=0.5)
