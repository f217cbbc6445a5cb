"""DiffSynthSampler: the inference engine, redesigned as one XLA program.

Reference: model/DiffSynthSampler.py (610 lines, Python-level per-step loop
with host sync each step). Here every sampling call - pure, img2img, or
inpaint, with or without classifier-free guidance, DDIM or DDPM - lowers to
a single jitted lax.scan over the respaced steps:

  * CFG batch-doubling happens inside the scan body (one U-Net call on 2B).
  * DDIM/DDPM update math uses gathered schedule constants (XLA constants).
  * Inpaint blending (mask * q_sample(guide, t-1) + (1-mask) * img) is in
    the body; dynamic masks enter as a (steps, W) scan input and broadcast.
  * Per-step DDPM noise derives from a folded PRNG key and inherits the
    "repeat" structure via the same width gather as the initial noise.

Compiled programs are cached per static signature (shape, steps, mode,
sampler, CFG on/off), so pipelines pay compile once per width bucket.
"""

from __future__ import annotations

import functools
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffusynth_tpu.diffusion import masks as masks_lib
from diffusynth_tpu.diffusion import noise as noise_lib
from diffusynth_tpu.diffusion.schedule import Schedule, q_sample


def _axon_backend() -> bool:
    try:
        return "axon" in jax.devices()[0].client.platform_version
    except Exception:  # noqa: BLE001
        return False


def _known_bad_scan_signature(batch: int, cfg_on: bool,
                              n_steps_exec: int) -> bool:
    """Scan signatures that fault the device on the axon remote compiler.

    History (docs/SCAN_FAULT.md): round 1 observed UNAVAILABLE "kernel
    fault" for the unconditional batch-64 width-64 sampling scan; the
    2026-08-17 bisect sweep (benchmarks/repro_scan_fault.py, one case per
    process) could no longer reproduce it at ANY of b32/48/64/96/128,
    cond/uncond, k2/k5, fused on/off — the backend was evidently fixed.
    The default denylist is therefore EMPTY; the fence stays wired so a
    regression can be fenced without code changes via
    DIFFUSYNTH_BAD_SCAN_BATCHES=64,96 (effective unet batch: CFG doubles
    the sampler batch).
    """
    del n_steps_exec  # the r1 fault was length-independent
    import os

    raw = os.environ.get("DIFFUSYNTH_BAD_SCAN_BATCHES", "")
    if not raw:
        return False
    bad = {int(v) for v in raw.split(",") if v.strip()}
    return batch * (2 if cfg_on else 1) in bad


# sampler name -> (eta, solver). "ddim"/"ddpm" mirror the reference
# (model/DiffSynthSampler.py:296-345, the eta=0/1 DDIM family); "dpmpp" is
# DPM-Solver++(2M) (Lu et al. 2022), a second-order multistep ODE solver
# with no reference counterpart: it reaches the 50-step-DDIM sample quality
# in ~15-25 steps, cutting per-generation U-Net cost ~2-2.5x at the same
# schedule. Deterministic (eta=0); its first-order step IS the DDIM step.
_SAMPLERS = {
    "ddim": (0.0, "euler"),
    "ddpm": (1.0, "euler"),
    "dpmpp": (0.0, "dpmpp"),
}


class DiffSynthSampler:
    """Sampling engine over a (respaced) diffusion schedule.

    Mirrors the reference API surface (sample / img_guided_sample /
    inpaint_sample / interpolate / respace /
    activate_classifier_free_guidance; reference: DiffSynthSampler.py:26-611)
    but takes an explicit U-Net apply function and PRNG keys, and returns
    only the final latent plus the initial noise (the reference accumulates
    every intermediate; SURVEY.md section 7 quirks).
    """

    def __init__(
        self,
        unet_apply: Callable,     # (x, t, condition) -> predicted noise
        timesteps: int = 1000,
        beta_start: float = 1e-4,
        beta_end: float = 0.02,
        height: int = 128,
        channels: int = 4,
        train_width: int = 64,
        max_width: int = 256,
        noise_strategy: str = "repeat",
        loop_mode: str = "python",
        batch_sharding=None,
    ):
        """loop_mode: "python" (default) drives one jitted step per
        iteration with async dispatch - the host enqueues all steps ahead,
        so steady-state throughput MATCHES the fused scan (measured 12.38
        vs 12.47 s p50 on the batch-64 50-step run) while the one-time
        compile drops from minutes to ~30 s (one step program instead of
        the unrolled-scan compile), and the axon AOT-compiler fault on
        specific (batch, width) scan combinations is avoided entirely.
        "scan" fuses all steps into one lax.scan program. "window" is the
        python loop with W<=5 steps scanned per dispatch (1/W the tunnel
        round trips; W divides the step count, falling back to per-step
        when no W in 2..5 divides it). Measured NEUTRAL vs "python" on
        the axon tunnel (10.40 vs 10.31 s b64 p50 — the wall-vs-device
        gap is not dispatch-count-bound there); kept as an option for
        deployments where per-dispatch overhead differs.

        batch_sharding: optional jax.sharding.NamedSharding for the batch
        axis - inputs are placed with it before the loop, so XLA shards the
        whole denoising program over the mesh (DP note/timbre rendering over
        ICI; SURVEY.md section 2.3).
        """
        self.unet_apply = unet_apply
        self.loop_mode = loop_mode
        self.batch_sharding = batch_sharding
        self.height = height
        self.channels = channels
        self.train_width = train_width
        self.max_width = max_width
        self.noise_strategy = noise_strategy
        self.schedule = Schedule.linear(timesteps, beta_start, beta_end)
        self.CFG = 1.0
        self.unconditional_condition = None
        self._loop_cache = {}

    # -- configuration ------------------------------------------------------

    def respace(self, use_timesteps: Optional[Sequence[int]] = None):
        """Subset the chain (reference: DiffSynthSampler.py:204-222)."""
        if use_timesteps is not None:
            self.schedule = self.schedule.respace(use_timesteps)
            self._loop_cache.clear()

    @property
    def num_timesteps(self) -> int:
        return self.schedule.num_timesteps

    def activate_classifier_free_guidance(self, CFG,
                                          unconditional_condition):
        """(reference: DiffSynthSampler.py:192-202)

        CFG may be a python scalar (one guidance scale for the whole
        batch) or a (B,)-shaped array of per-sample scales;
        unconditional_condition may be a (D,) vector or a (B, D) batch of
        per-sample negative-prompt embeddings. Both enter the compiled
        loop as TRACED inputs, so changing the scale or the negative
        prompt never recompiles — and serving can coalesce requests with
        different cfg / negative prompts into one batched launch.
        """
        arr = np.asarray(CFG)
        if arr.ndim == 0:
            self.CFG = float(arr)
            scalar_off = self.CFG == 1.0
        else:
            assert arr.ndim == 1, f"CFG must be scalar or (B,), got {arr.shape}"
            self.CFG = jnp.asarray(arr, jnp.float32)
            scalar_off = False
        assert unconditional_condition is not None or scalar_off, (
            "For CFG != 1.0, unconditional_condition must be available"
        )
        self.unconditional_condition = unconditional_condition

    @property
    def cfg_on(self) -> bool:
        """Whether classifier-free guidance is active (scalar 1.0 = off;
        any per-sample array = on, entries of exactly 1.0 reduce to the
        conditioned prediction)."""
        c = self.CFG
        return not (np.ndim(c) == 0 and float(c) == 1.0)

    # -- noise --------------------------------------------------------------

    def build_noise(self, key, batch, width, template=None):
        return noise_lib.build_noise(
            key, batch, self.height, width, self.channels,
            train_width=self.train_width, max_width=self.max_width,
            strategy=self.noise_strategy, template=template,
        )

    def q_sample(self, x_start, t, noise):
        return q_sample(x_start, t, self.schedule, noise)

    # -- the scan -----------------------------------------------------------

    def _get_loop(self, batch: int, width: int, n_steps_exec: int,
                  start_idx: int, eta: float, cfg_on: bool, inpaint: bool,
                  mask_mode: str, return_traj: bool, solver: str = "euler"):
        """Build (or fetch) the jitted scan for one static signature."""
        import os

        # CFG prefix sharing (nn/unet.py cfg_dual): the U-Net's
        # condition-independent prefix (init_conv + downs_0_0) runs once at
        # batch B instead of twice in the CFG double — exact same math,
        # measured device win (RESULTS_r2.md H13). Opt out with
        # DIFFUSYNTH_CFG_PREFIX_SHARE=0 (A/B measurement hook).
        cfg_dual = (cfg_on
                    and getattr(self.unet_apply, "supports_cfg_dual", False)
                    and os.environ.get("DIFFUSYNTH_CFG_PREFIX_SHARE",
                                       "1") != "0")
        # The guidance scale is NOT part of the signature: it enters the
        # compiled program as a traced (B,) input (per-sample CFG), so a
        # changed scale or negative prompt reuses the cached program.
        sig = (batch, width, n_steps_exec, start_idx, eta, cfg_on, inpaint,
               mask_mode, return_traj, solver, self.num_timesteps,
               cfg_dual)
        if sig in self._loop_cache:
            return self._loop_cache[sig]

        sched = self.schedule
        alphas_cumprod = jnp.asarray(sched.alphas_cumprod, jnp.float32)
        alphas_cumprod_prev = jnp.asarray(sched.alphas_cumprod_prev, jnp.float32)
        sqrt_ac = jnp.asarray(sched.sqrt_alphas_cumprod, jnp.float32)
        sqrt_1mac = jnp.asarray(sched.sqrt_one_minus_alphas_cumprod, jnp.float32)
        timestep_map = jnp.asarray(sched.timestep_map, jnp.int32)
        dpmpp = solver == "dpmpp"
        if dpmpp:
            # DPM-Solver++(2M) per-chain-index constants (Lu et al. 2022,
            # data-prediction multistep form; float64 on host). Stepping
            # from chain index i to i-1:
            #   x <- (sigma_prev/sigma_i) * x
            #        + alpha_prev * (1 - e^{-h_i}) * D_i
            #   D_i = x0_i + (h_i / (2 h_{i-1})) * (x0_i - x0_prev)
            # with h_i = lambda_prev(i) - lambda(i), lambda = log(alpha/sigma),
            # and h_{i-1} the PREVIOUS loop step (chain i+1 -> i; the loop
            # always walks consecutive respaced indices). First-order
            # (== DDIM eta=0) on the first iteration (no x0_prev; the first
            # iteration is always chain index start_idx-1, a static value,
            # so it is zeroed host-side) and on the final i==0 step where
            # sigma_prev=0 makes h infinite (the update then returns D
            # exactly -- diffusers' lower_order_final behavior).
            ac_np = np.asarray(sched.alphas_cumprod, np.float64)
            acp_np = np.asarray(sched.alphas_cumprod_prev, np.float64)
            a_np, s_np = np.sqrt(ac_np), np.sqrt(1.0 - ac_np)
            ap_np, sp_np = np.sqrt(acp_np), np.sqrt(1.0 - acp_np)
            lam = 0.5 * (np.log(ac_np) - np.log(1.0 - ac_np))
            with np.errstate(divide="ignore"):
                lam_prev = np.where(
                    sp_np > 0.0,
                    0.5 * (np.log(acp_np)
                           - np.log(np.maximum(1.0 - acp_np, 1e-300))),
                    np.inf,
                )
            h_cur = lam_prev - lam
            h_prev_step = np.ones_like(lam)
            h_prev_step[:-1] = lam[:-1] - lam[1:]
            with np.errstate(invalid="ignore"):
                inv2r_np = np.where(np.isfinite(h_cur),
                                    h_cur / (2.0 * h_prev_step), 0.0)
            if start_idx >= 1:
                inv2r_np[start_idx - 1] = 0.0  # first loop iteration
            # e^{-h} via the exact ratio (0 at i==0 where sigma_prev=0).
            exp_neg_h = np.where(sp_np > 0.0,
                                 (a_np * sp_np)
                                 / (s_np * np.maximum(ap_np, 1e-300)),
                                 0.0)
            dp_sigma_ratio = jnp.asarray(sp_np / s_np, jnp.float32)
            dp_coef_D = jnp.asarray(ap_np * (1.0 - exp_neg_h), jnp.float32)
            dp_inv2r = jnp.asarray(inv2r_np, jnp.float32)
        unet_apply = self.unet_apply
        height, channels = self.height, self.channels
        train_width = self.train_width
        strategy = self.noise_strategy
        if strategy == "repeat":
            ridx, _ = noise_lib.repeat_indices(width, train_width)
            ridx = jnp.asarray(ridx)

        # Program identity for the AOT cache's FAST path (skips the
        # 30-170 s trace/lower on later processes, aot_cache.py): the
        # static signature + everything else this closure bakes into the
        # lowered program — the respaced schedule arrays, model identity
        # (config + dtype + quantize via program_identity), geometry, and
        # sharding. An under-described identity would load a stale
        # program, so anything new baked into `loop`/`_body_impl` below
        # MUST be added here.
        import hashlib as _hashlib

        _sched_id = _hashlib.sha256(
            np.asarray(sched.timestep_map).tobytes()
            + np.asarray(sched.alphas_cumprod, np.float64).tobytes()
        ).hexdigest()[:16]
        _model_id = getattr(unet_apply, "program_identity", None)
        if _model_id is None:
            # A direct DiffSynthSampler user whose unet_apply carries no
            # program_identity: two different U-Nets with identical
            # param-tree signatures would otherwise share a fast key and
            # load each other's executables (advisor r4). fast_key=None
            # falls back to the exact lowered-text path.
            fast_id = None
        else:
            fast_id = ("sampler", repr(sig), _sched_id, _model_id,
                       height, channels, train_width, self.max_width,
                       strategy, repr(self.batch_sharding))

        def loop(params, init_img, cond, uncond, guide, init_noise,
                 mask_profiles, static_mask, key, cfg_scale):
            """One fully-fused sampling run."""

            def model_eval(img, mapped_t_b, _cond, _uncond):
                if cfg_on:
                    c_in = jnp.concatenate([_uncond, _cond], axis=0)
                    if cfg_dual:
                        eps = unet_apply(params, img, mapped_t_b, c_in,
                                         cfg_dual=True)
                    else:
                        x_in = jnp.concatenate([img, img], axis=0)
                        t_in = jnp.concatenate(
                            [mapped_t_b, mapped_t_b], axis=0)
                        eps = unet_apply(params, x_in, t_in, c_in)
                    eps_u, eps_c = jnp.split(eps, 2, axis=0)
                    s = cfg_scale.reshape(-1, 1, 1, 1)
                    return eps_u + s * (eps_c - eps_u)
                return unet_apply(params, img, mapped_t_b, _cond)

            def body(carry, xs):
                i, mask_w, step_key = xs
                if dpmpp:
                    img, x0_prev = carry
                else:
                    img = carry
                t_b = jnp.full((batch,), i, dtype=jnp.int32)
                mapped_t_b = timestep_map[t_b]
                eps = model_eval(img, mapped_t_b, cond, uncond).astype(jnp.float32)

                ac_t = alphas_cumprod[i]
                ac_prev = alphas_cumprod_prev[i]
                pred_x0 = (img - jnp.sqrt(1.0 - ac_t) * eps) / jnp.sqrt(ac_t)
                if dpmpp:
                    D = pred_x0 + dp_inv2r[i] * (pred_x0 - x0_prev)
                    img = dp_sigma_ratio[i] * img + dp_coef_D[i] * D
                else:
                    sigma = (
                        eta
                        * jnp.sqrt((1.0 - ac_prev) / (1.0 - ac_t))
                        * jnp.sqrt(1.0 - ac_t / ac_prev)
                    )
                    dir_xt = jnp.sqrt(1.0 - ac_prev - sigma**2) * eps
                    img = jnp.sqrt(ac_prev) * pred_x0 + dir_xt
                if eta > 0.0:
                    if strategy == "repeat":
                        tmpl = jax.random.normal(
                            step_key, (batch, height, train_width, channels)
                        )
                        step_noise = tmpl[:, :, ridx, :]
                    else:
                        step_noise = jax.random.normal(
                            step_key, (batch, height, width, channels)
                        )
                    img = img + sigma * step_noise

                if inpaint:
                    tm1 = jnp.maximum(i - 1, 0)
                    t_b1 = jnp.full((batch,), tm1, dtype=jnp.int32)
                    noised_guide = (
                        sqrt_ac[t_b1].reshape(-1, 1, 1, 1) * guide
                        + sqrt_1mac[t_b1].reshape(-1, 1, 1, 1) * init_noise
                    )
                    blend_src = jnp.where(i > 0, noised_guide, guide)
                    if mask_mode == "dynamic":
                        m = mask_w.reshape(1, 1, width, 1)
                    else:
                        m = static_mask
                    img = m * blend_src + (1.0 - m) * img
                if dpmpp:
                    return (img, pred_x0), (img if return_traj else None)
                return img, (img if return_traj else None)

            i_vals = jnp.arange(
                start_idx - 1, start_idx - 1 - n_steps_exec, -1, dtype=jnp.int32
            )
            step_keys = jax.random.split(key, n_steps_exec)
            if mask_profiles is None:
                mask_profiles = jnp.zeros((n_steps_exec, width), jnp.float32)
            init_carry = ((init_img, jnp.zeros_like(init_img)) if dpmpp
                          else init_img)
            final, traj = jax.lax.scan(
                body, init_carry, (i_vals, mask_profiles, step_keys)
            )
            if dpmpp:
                final = final[0]
            return final, traj

        use_python = self.loop_mode in ("python", "window")
        if (not use_python and _axon_backend()
                and _known_bad_scan_signature(batch, cfg_on, n_steps_exec)):
            import warnings
            warnings.warn(
                f"loop_mode='scan' requested for a signature known to fault "
                f"the axon compiler (effective batch "
                f"{batch * (2 if cfg_on else 1)}); falling back to the "
                f"equivalence-tested python step loop "
                f"(benchmarks/repro_scan_fault.py, docs/SCAN_FAULT.md)",
                stacklevel=3,
            )
            use_python = True

        if use_python:
            # Workaround path: the axon AOT compiler faults on the fused
            # scan for some signatures (docs/SCAN_FAULT.md) while the
            # identical per-step program runs fine. Same math, one jitted
            # step, host-driven loop; async dispatch matches the scan's
            # steady state (measured 12.41 vs 12.47 s p50 b64).
            def _body_impl(params, img, x0_prev, i, mask_w, step_key, cond,
                           uncond, guide, init_noise, static_mask, cfg_scale):

                def model_eval(img, mapped_t_b):
                    if cfg_on:
                        c_in = jnp.concatenate([uncond, cond], axis=0)
                        if cfg_dual:
                            eps = unet_apply(params, img, mapped_t_b, c_in,
                                             cfg_dual=True)
                        else:
                            x_in = jnp.concatenate([img, img], axis=0)
                            t_in = jnp.concatenate(
                                [mapped_t_b, mapped_t_b], axis=0)
                            eps = unet_apply(params, x_in, t_in, c_in)
                        eps_u, eps_c = jnp.split(eps, 2, axis=0)
                        s = cfg_scale.reshape(-1, 1, 1, 1)
                        return eps_u + s * (eps_c - eps_u)
                    return unet_apply(params, img, mapped_t_b, cond)

                t_b = jnp.full((batch,), i, dtype=jnp.int32)
                eps = model_eval(img, timestep_map[t_b]).astype(jnp.float32)
                ac_t = alphas_cumprod[i]
                ac_prev = alphas_cumprod_prev[i]
                pred_x0 = (img - jnp.sqrt(1.0 - ac_t) * eps) / jnp.sqrt(ac_t)
                if dpmpp:
                    D = pred_x0 + dp_inv2r[i] * (pred_x0 - x0_prev)
                    img = dp_sigma_ratio[i] * img + dp_coef_D[i] * D
                else:
                    sigma = (eta * jnp.sqrt((1.0 - ac_prev) / (1.0 - ac_t))
                             * jnp.sqrt(1.0 - ac_t / ac_prev))
                    dir_xt = jnp.sqrt(1.0 - ac_prev - sigma**2) * eps
                    img = jnp.sqrt(ac_prev) * pred_x0 + dir_xt
                if eta > 0.0:
                    if strategy == "repeat":
                        tmpl = jax.random.normal(
                            step_key, (batch, height, train_width, channels))
                        img = img + sigma * tmpl[:, :, ridx, :]
                    else:
                        img = img + sigma * jax.random.normal(
                            step_key, (batch, height, width, channels))
                if inpaint:
                    tm1 = jnp.maximum(i - 1, 0)
                    t_b1 = jnp.full((batch,), tm1, dtype=jnp.int32)
                    noised_guide = (
                        sqrt_ac[t_b1].reshape(-1, 1, 1, 1) * guide
                        + sqrt_1mac[t_b1].reshape(-1, 1, 1, 1) * init_noise)
                    blend_src = jnp.where(i > 0, noised_guide, guide)
                    m = (mask_w.reshape(1, 1, width, 1)
                         if mask_mode == "dynamic" else static_mask)
                    img = m * blend_src + (1.0 - m) * img
                if dpmpp:
                    return img, pred_x0
                return img

            from diffusynth_tpu.utils.aot_cache import aot_jit
            jitted_step = aot_jit(_body_impl, name="sampler_step",
                                  fast_key=fast_id)
            # For the euler/ancestral solvers x0_prev is an unused traced
            # placeholder (DCE'd by XLA); dpmpp threads the previous x0
            # estimate through it (2M multistep history).
            x0_placeholder = jnp.zeros((1,), jnp.float32)

            # loop_mode="window": scan W consecutive steps per dispatch —
            # same step math, 1/W the host->device round trips (each
            # python-loop call pays a tunnel RPC + params-pytree
            # flattening; measured as the residual wall-minus-device gap,
            # RESULTS_r2.md). W divides n_steps_exec so one program
            # serves every window.
            W = 1
            if self.loop_mode == "window":
                for cand in (5, 4, 3, 2):
                    if n_steps_exec % cand == 0:
                        W = cand
                        break

            if W > 1:
                def _window_impl(params, img, x0_prev, i_w, masks_w, keys_w,
                                 cond, uncond, guide, init_noise, static_mask,
                                 cfg_scale):
                    def body(carry, xs):
                        i, m, k = xs
                        img, x0p = carry
                        out = _body_impl(params, img, x0p, i, m, k, cond,
                                         uncond, guide, init_noise,
                                         static_mask, cfg_scale)
                        img, x0p = out if dpmpp else (out, x0p)
                        return (img, x0p), (img if return_traj else None)
                    (img, x0_prev), traj = jax.lax.scan(
                        body, (img, x0_prev), (i_w, masks_w, keys_w))
                    return img, x0_prev, traj

                jitted_window = aot_jit(
                    _window_impl, name="sampler_window",
                    fast_key=None if fast_id is None
                    else fast_id + ("W", W))

            def python_loop(params, init_img, cond, uncond, guide, init_noise,
                            mask_profiles, static_mask, key, cfg_scale):
                i_vals = np.arange(start_idx - 1,
                                   start_idx - 1 - n_steps_exec, -1)
                step_keys = jax.random.split(key, n_steps_exec)
                if mask_profiles is None:
                    mask_profiles = jnp.zeros((n_steps_exec, width),
                                              jnp.float32)
                img = init_img
                x0p = jnp.zeros_like(init_img) if dpmpp else x0_placeholder
                traj = []
                if W > 1:
                    i_dev = jnp.asarray(i_vals, jnp.int32)
                    for w0 in range(0, n_steps_exec, W):
                        img, x0p, tw = jitted_window(
                            params, img, x0p, i_dev[w0:w0 + W],
                            mask_profiles[w0:w0 + W], step_keys[w0:w0 + W],
                            cond, uncond, guide, init_noise, static_mask,
                            cfg_scale)
                        if return_traj:
                            traj.append(tw)
                    return img, (jnp.concatenate(traj)
                                 if return_traj else None)
                for j, i in enumerate(i_vals):
                    out = jitted_step(params, img, x0p, jnp.int32(i),
                                      mask_profiles[j], step_keys[j], cond,
                                      uncond, guide, init_noise, static_mask,
                                      cfg_scale)
                    img, x0p = out if dpmpp else (out, x0p)
                    if return_traj:
                        traj.append(img)
                return img, (jnp.stack(traj) if return_traj else None)

            self._loop_cache[sig] = python_loop
            return python_loop

        from diffusynth_tpu.utils.aot_cache import aot_jit
        jitted = aot_jit(loop, name="sampler_loop", fast_key=fast_id)
        self._loop_cache[sig] = jitted
        return jitted

    # -- public API ---------------------------------------------------------

    def p_sample_loop(
        self,
        params,
        shape: Tuple[int, int, int, int],
        key: jax.Array,
        initial_noise: Optional[jnp.ndarray] = None,
        start_noise_level_ratio: float = 1.0,
        end_noise_level_ratio: float = 0.0,
        condition: Optional[jnp.ndarray] = None,
        guide_img: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        sampler: str = "ddim",
        inpaint: bool = False,
        use_dynamic_mask: bool = False,
        mask_flexivity: float = 0.8,
        return_trajectory: bool = False,
    ):
        """Full sampling loop (reference: DiffSynthSampler.py:424-517).

        shape: (B, height, width, channels) NHWC.
        Returns (final_latent, initial_noise) or
        (trajectory, initial_noise) when return_trajectory.
        """
        B, H, W, C = shape
        assert H == self.height and C == self.channels, (shape,)
        eta, solver = _SAMPLERS[sampler]

        key_init, key_steps = jax.random.split(key)
        init_noise, concat_points = self.build_noise(
            key_init, B, W, template=initial_noise
        )
        assert init_noise.shape == shape, (init_noise.shape, shape)

        start_idx = int(self.num_timesteps * start_noise_level_ratio)
        end_idx = int(self.num_timesteps * end_noise_level_ratio)
        n_steps = start_idx - end_idx
        assert (start_noise_level_ratio == 1.0) or (guide_img is not None), (
            "A guide_img must be given to sample from a non-pure-noise."
        )

        if guide_img is None:
            img0 = init_noise
        else:
            guide_img = self._expand_guide(guide_img, B, W)
            if concat_points is None:
                _, concat_points = noise_lib.repeat_indices(W, self.train_width)
            if start_idx > 0:
                t = jnp.full((B,), start_idx - 1, dtype=jnp.int32)
                img0 = self.q_sample(guide_img, t, init_noise)
            else:
                img0 = guide_img

        # Per-step masks (consumed in build order; the final i==0 step reuses
        # the previous mask, reference: DiffSynthSampler.py:499-510).
        mask_profiles = None
        static_mask = None
        mask_mode = "none"
        if inpaint:
            if use_dynamic_mask:
                profs = masks_lib.dynamic_mask_profiles(
                    n_steps, W, concat_points, self.train_width, mask_flexivity
                )
                if end_idx == 0 and n_steps >= 2:
                    order = list(range(n_steps - 1)) + [n_steps - 2]
                else:
                    order = list(range(n_steps))
                mask_profiles = jnp.asarray(profs[order])
                mask_mode = "dynamic"
            else:
                assert mask is not None, "inpaint without dynamic mask needs a mask"
                static_mask = jnp.asarray(mask, jnp.float32)
                mask_mode = "static"

        loop = self._get_loop(
            B, W, n_steps, start_idx, eta, self.cfg_on, inpaint,
            mask_mode, return_trajectory, solver,
        )

        uncond, cfg_arr = self._cfg_batch(B)
        guide_arg = guide_img if guide_img is not None else jnp.zeros(shape)
        smask_arg = (
            static_mask if static_mask is not None
            else jnp.zeros((1, 1, 1, 1), jnp.float32)
        )
        if (self.batch_sharding is not None
                and B % self.batch_sharding.mesh.size == 0):
            # DP over the mesh: place batch-major inputs with the sharding;
            # XLA propagates it through the whole scan (params replicate).
            # Batches not divisible by the mesh stay on the default device.
            img0 = jax.device_put(img0, self.batch_sharding)
            guide_arg = jax.device_put(guide_arg, self.batch_sharding)
            init_noise = jax.device_put(init_noise, self.batch_sharding)
            cond_sharding = jax.sharding.NamedSharding(
                self.batch_sharding.mesh,
                jax.sharding.PartitionSpec(self.batch_sharding.spec[0], None),
            )
            if condition is not None:
                condition = jax.device_put(condition, cond_sharding)
            if uncond is not None:
                uncond = jax.device_put(uncond, cond_sharding)
                scale_sharding = jax.sharding.NamedSharding(
                    self.batch_sharding.mesh,
                    jax.sharding.PartitionSpec(self.batch_sharding.spec[0]),
                )
                cfg_arr = jax.device_put(cfg_arr, scale_sharding)
        final, traj = loop(
            params, img0, condition, uncond, guide_arg, init_noise,
            mask_profiles, smask_arg, key_steps, cfg_arr,
        )
        if return_trajectory:
            return traj, init_noise
        return final, init_noise

    def _cfg_batch(self, batch: int):
        """(uncond, cfg_scale) batch-shaped for the loop: uncond (B, D) and
        cfg_scale (B,) f32 — scalar scale / (D,) embedding broadcast, or
        per-sample (B,) / (B, D) values passed through (the serving layer
        coalesces mixed cfg / negative-prompt requests this way)."""
        if not self.cfg_on:
            return None, jnp.ones((batch,), jnp.float32)
        u = jnp.asarray(self.unconditional_condition)
        if u.ndim == 1:
            u = u.reshape(1, -1)
        assert u.shape[0] in (1, batch), (
            f"unconditional_condition batch {u.shape[0]} != sample "
            f"batch {batch}"
        )
        uncond = jnp.broadcast_to(u, (batch, u.shape[-1]))
        c = jnp.asarray(self.CFG, jnp.float32).reshape(-1)
        assert c.shape[0] in (1, batch), (
            f"CFG batch {c.shape[0]} != sample batch {batch}"
        )
        cfg_arr = jnp.broadcast_to(c, (batch,))
        return uncond, cfg_arr

    def _expand_guide(self, guide: jnp.ndarray, batch: int, width: int):
        """Tile a train-width guide latent to the target width with the
        repeat index map (the reference runs its repeat builder on the guide,
        DiffSynthSampler.py:471)."""
        if guide.shape[0] == 1 and batch > 1:
            guide = jnp.broadcast_to(guide, (batch,) + guide.shape[1:])
        gw = guide.shape[2]
        if gw == width:
            return guide
        assert gw == self.train_width, (
            f"guide width {gw} must equal target width {width} or "
            f"train_width {self.train_width}"
        )
        idx, _ = noise_lib.repeat_indices(width, self.train_width)
        return guide[:, :, jnp.asarray(idx), :]

    def sample(self, params, shape, key, condition=None, sampler="ddim",
               initial_noise=None, return_trajectory=False):
        """Pure generation from noise (reference: DiffSynthSampler.py:520-536)."""
        return self.p_sample_loop(
            params, shape, key, initial_noise=initial_noise,
            start_noise_level_ratio=1.0, end_noise_level_ratio=0.0,
            condition=condition, sampler=sampler,
            return_trajectory=return_trajectory,
        )

    def img_guided_sample(self, params, shape, key, noising_strength,
                          guide_img, condition=None, sampler="ddim",
                          initial_noise=None, return_trajectory=False):
        """Style transfer / img2img (reference: DiffSynthSampler.py:562-583)."""
        return self.p_sample_loop(
            params, shape, key, initial_noise=initial_noise,
            start_noise_level_ratio=noising_strength,
            end_noise_level_ratio=0.0, condition=condition,
            guide_img=guide_img, sampler=sampler,
            return_trajectory=return_trajectory,
        )

    def inpaint_sample(self, params, shape, key, noising_strength, guide_img,
                       mask=None, condition=None, sampler="ddim",
                       initial_noise=None, use_dynamic_mask=False,
                       end_noise_level_ratio=0.0, mask_flexivity=0.8,
                       return_trajectory=False):
        """Masked resampling (reference: DiffSynthSampler.py:585-611).

        mask: (B or 1, H, W, 1), 1.0 = keep guide. Ignored with
        use_dynamic_mask.
        """
        return self.p_sample_loop(
            params, shape, key, initial_noise=initial_noise,
            start_noise_level_ratio=noising_strength,
            end_noise_level_ratio=end_noise_level_ratio,
            condition=condition, guide_img=guide_img, mask=mask,
            sampler=sampler, inpaint=True,
            use_dynamic_mask=use_dynamic_mask, mask_flexivity=mask_flexivity,
            return_trajectory=return_trajectory,
        )

    def interpolate(self, params, shape, key, variance=1.0,
                    first_endpoint=None, second_endpoint=None, condition=None,
                    sampler="ddim", return_trajectory=False):
        """Generation from a linearly interpolated noise batch
        (reference: DiffSynthSampler.py:538-560)."""
        linear_noise = noise_lib.linear_interpolation_noise(
            key, shape, variance, first_endpoint, second_endpoint,
            train_width=self.train_width,
        )
        return self._sample_with_noise(
            params, shape, key, linear_noise, condition, sampler,
            return_trajectory,
        )

    def _sample_with_noise(self, params, shape, key, noise, condition,
                           sampler, return_trajectory):
        """sample() but with a fully specified initial noise tensor."""
        B, H, W, C = shape
        eta, solver = _SAMPLERS[sampler]
        n_steps = self.num_timesteps
        loop = self._get_loop(B, W, n_steps, n_steps, eta, self.cfg_on,
                              False, "none", return_trajectory, solver)
        uncond, cfg_arr = self._cfg_batch(B)
        final, traj = loop(params, noise, condition, uncond,
                           jnp.zeros(shape), noise, None,
                           jnp.zeros((1, 1, 1, 1), jnp.float32), key,
                           cfg_arr)
        if return_trajectory:
            return traj, noise
        return final, noise
