"""Benchmark harness for the five BASELINE.json configurations.

Run: python -m benchmarks.harness [--config N] [--out results.json]

Configs (BASELINE.md):
  1. text2sound: single 4s timbre, batch 1, 20-step DDIM + Griffin-Lim
  2. batched text2sound: batch 64, 50-step DDIM + VQGAN decode, CFG sweep
  3. sound2sound + inpaint round trip
  4. full-MIDI track render with per-note batching
  5. training steps/sec: VQGAN + contrastive + diffusion

Each benchmark reports p50 wall-clock (compile excluded) as one JSON record.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _runtime():
    import jax

    from diffusynth_tpu.configs import AppConfig
    from diffusynth_tpu.pipelines import DiffuSynthRuntime
    from diffusynth_tpu.text import CachedTextEncoder, HashTextEncoder

    return DiffuSynthRuntime(
        AppConfig(), text_encoder=CachedTextEncoder(HashTextEncoder(512)),
        seed=0,
    )


def bench_text2sound_single(rt):
    """Config 1: batch 1, 20-step DDIM, Griffin-Lim reconstruction."""
    import jax
    import jax.numpy as jnp

    from diffusynth_tpu.dsp import griffin_lim
    from diffusynth_tpu.pipelines import Text2SoundPipeline
    from diffusynth_tpu.utils import time_fn

    pipe = Text2SoundPipeline(rt)

    def run():
        res = pipe("a bright organ", batchsize=1, duration_sec=3.0, steps=20,
                   cfg=6.0, seed=1, return_audio=False)
        mag = jnp.abs(
            jnp.expm1(res.spectrograms[..., 0])
        )
        # Griffin-Lim from the predicted magnitudes (tools.py:220-223 path).
        pad = jnp.pad(mag, ((0, 0), (1, 0), (0, 0)))
        return griffin_lim(pad, jax.random.key(0), n_iter=16,
                           hop_length=rt.config.audio.hop_length,
                           win_length=rt.config.audio.win_length)

    stats = time_fn(run, iters=3, warmup=1)
    return {"name": "text2sound_b1_ddim20_griffinlim", "p50_s": stats["p50"],
            "timbres_per_sec": 1.0 / stats["p50"]}


def bench_text2sound_batched(rt, cfg_scales=(1.0, 3.0, 6.0)):
    """Config 2: batch 64, 50-step DDIM + decode, CFG sweep — the full
    range the reference UI exposes (gradio_webUI.py:80-85) including
    cfg=1.0, the unconditional batch-64 case.

    cfg=1.0 is safe to include because ops/dispatch.py now fences Mosaic
    kernels OUT of batch-64 step programs BY DEFAULT — the 2026-08-17
    remote-compiler wedge was specific to the unconditional b64 step
    program containing Mosaic attention custom-calls; the XLA
    formulation the fence selects compiled and ran clean when probed
    (docs/SCAN_FAULT.md). DIFFUSYNTH_HARNESS_CFGS overrides the sweep;
    DIFFUSYNTH_BAD_STEP_BATCHES=none + DIFFUSYNTH_HARNESS_CFGS=1.0
    probes the original Mosaic signature (probe LAST — a reproduction
    takes the shared device down)."""
    import os

    from diffusynth_tpu.pipelines import Text2SoundPipeline
    from diffusynth_tpu.utils import time_fn

    raw = os.environ.get("DIFFUSYNTH_HARNESS_CFGS", "")
    if raw:
        cfg_scales = tuple(float(v) for v in raw.split(",") if v.strip())

    pipe = Text2SoundPipeline(rt)
    out = []
    for cfg in cfg_scales:
        stats = time_fn(
            lambda: pipe("a bright synthetic lead", "noise", batchsize=64,
                         duration_sec=3.0, steps=50, cfg=cfg, seed=2,
                         return_audio=False),
            iters=3, warmup=1,
        )
        out.append({
            "name": f"text2sound_b64_ddim50_cfg{cfg}",
            "p50_s": stats["p50"],
            "timbres_per_sec_per_chip": 64.0 / stats["p50"],
        })
    return out


def bench_sound2sound_inpaint(rt):
    """Config 3: encode -> img2img -> inpaint round trip."""
    import jax.numpy as jnp

    from diffusynth_tpu.pipelines import InpaintPipeline, Sound2SoundPipeline
    from diffusynth_tpu.pipelines.inpaint import build_latent_mask
    from diffusynth_tpu.utils import time_fn

    a = rt.config.audio
    s2s = Sound2SoundPipeline(rt)
    inp = InpaintPipeline(rt)
    rng = np.random.default_rng(0)
    audio = rng.standard_normal(a.audio_length_from_width(64)).astype(
        np.float32)
    mask = build_latent_mask(a.latent_height, 64, a.vae_scale,
                             a.time_resolution, mask_time_begin=1.0,
                             mask_time_end=2.0, mask_frequency_begin=0,
                             mask_frequency_end=a.latent_height,
                             inpaint_area="unmasked")

    def run():
        _, _, zq = s2s.encode_origin_audio(audio, a.sample_rate, 3.0)
        r1 = s2s(zq, "warm strings", batchsize=4, noising_strength=0.5,
                 steps=20, cfg=6.0, seed=3)
        r2 = inp(zq, mask, "bells", batchsize=4, steps=20, cfg=6.0, seed=4)
        return r1.latents, r2.latents

    stats = time_fn(run, iters=3, warmup=1)
    return {"name": "sound2sound_plus_inpaint_b4", "p50_s": stats["p50"]}


def bench_track_render(rt, n_notes=48):
    """Config 4: MIDI render with per-note batching."""
    import tempfile

    import jax.numpy as jnp

    from diffusynth_tpu.midi import MidiFile
    from diffusynth_tpu.midi.parser import write_midi
    from diffusynth_tpu.pipelines import TrackRenderPipeline
    from diffusynth_tpu.pipelines.track_render import InstrumentConfig
    from diffusynth_tpu.ui.presets import load_presets

    rng = np.random.default_rng(0)
    notes = []
    t = 0
    for i in range(n_notes):
        pitch = int(rng.integers(45, 70))
        dur = int(rng.choice([960, 1440, 2880]))
        notes.append((pitch, 100, t, dur))
        t += int(rng.choice([480, 960]))
    with tempfile.NamedTemporaryFile(suffix=".mid", delete=False) as f:
        path = f.name
    write_midi(path, notes)
    mid = MidiFile.from_file(path)

    instruments, _ = load_presets(rt)
    name = "preset_organ"
    icfg = InstrumentConfig(
        latent=instruments[name]["latent_representation"], sample_steps=10)
    pipe = TrackRenderPipeline(rt)

    t0 = time.perf_counter()
    audio = pipe.render(mid, {name: icfg}, [name], max_notes=n_notes)
    first = time.perf_counter() - t0  # includes per-width compiles
    t0 = time.perf_counter()
    audio = pipe.render(mid, {name: icfg}, [name], max_notes=n_notes)
    cached = time.perf_counter() - t0
    return {"name": f"track_render_{n_notes}notes", "first_s": first,
            "cached_s": cached, "notes_per_sec": n_notes / cached,
            "audio_len_s": len(audio) / rt.config.audio.sample_rate}


def bench_training(rt, iters=10):
    """Config 5: train-step throughput for diffusion/VQGAN/contrastive."""
    import jax
    import jax.numpy as jnp

    from diffusynth_tpu.configs import (
        ContrastiveTrainConfig,
        MultiModalConfig,
        TimbreEncoderConfig,
        VQGANTrainConfig,
    )
    from diffusynth_tpu.nn import MultiModalModel, VQGANDiscriminator
    from diffusynth_tpu.train import (
        make_contrastive_train_step,
        make_diffusion_train_step,
        make_vqgan_train_step,
    )

    results = {}
    rng = np.random.default_rng(0)

    # Diffusion step (B=8, latent 128x64): the headline training cost.
    latents = jnp.asarray(rng.standard_normal((8, 128, 64, 4)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((8, 512)), jnp.float32)
    uncond = jnp.zeros(512)
    params = rt.unet_variables
    init_fn, step_fn = make_diffusion_train_step(rt.unet, timesteps=1000)
    opt_state = init_fn(params)
    key = jax.random.key(0)
    params, opt_state, _ = step_fn(params, opt_state, key, latents, cond,
                                   uncond)  # compile
    t0 = time.perf_counter()
    for i in range(iters):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step_fn(params, opt_state, sub, latents,
                                          cond, uncond)
    loss.block_until_ready()
    results["diffusion_train_steps_per_sec_b8"] = iters / (
        time.perf_counter() - t0)

    # Same step at steps_per_dispatch=8 (one scan dispatch carries 8
    # optimizer steps; amortizes the per-call marshaling of the donated
    # params+opt_state pytree — the wall-vs-device gap of the row above).
    K = 8
    init_fn, stepk = make_diffusion_train_step(rt.unet, timesteps=1000,
                                               steps_per_dispatch=K)
    opt_state = init_fn(params)
    lat_k = jnp.broadcast_to(latents[None], (K,) + latents.shape)
    cond_k = jnp.broadcast_to(cond[None], (K,) + cond.shape)
    params, opt_state, losses = stepk(params, opt_state, key, lat_k, cond_k,
                                      uncond)  # compile
    jax.block_until_ready(losses)
    n_disp = max(1, iters // 2)
    t0 = time.perf_counter()
    for i in range(n_disp):
        key, sub = jax.random.split(key)
        params, opt_state, losses = stepk(params, opt_state, sub, lat_k,
                                          cond_k, uncond)
    jax.block_until_ready(losses)
    results["diffusion_train_steps_per_sec_b8_k8"] = n_disp * K / (
        time.perf_counter() - t0)

    # VQGAN step (B=4, 512x256 spectrograms).
    disc = VQGANDiscriminator(dtype=rt.vqgan.dtype)
    data = jnp.asarray(
        np.abs(rng.standard_normal((4, 512, 256, 3))), jnp.float32)
    d_params = disc.init(jax.random.key(1), data)
    g_vars = rt.vqgan_variables
    vinit, vstep = make_vqgan_train_step(rt.vqgan, disc, VQGANTrainConfig())
    g_opt, d_opt = vinit(g_vars, d_params)
    g_vars, d_params, g_opt, d_opt, m = vstep(g_vars, d_params, g_opt, d_opt,
                                              data)
    t0 = time.perf_counter()
    for _ in range(max(iters // 2, 1)):
        g_vars, d_params, g_opt, d_opt, m = vstep(
            g_vars, d_params, g_opt, d_opt, data)
    m["g_loss"].block_until_ready()
    results["vqgan_train_steps_per_sec_b4"] = max(iters // 2, 1) / (
        time.perf_counter() - t0)

    # VQGAN at steps_per_dispatch=4 (same marshaling-amortization row).
    Kv = 4
    vinitk, vstepk = make_vqgan_train_step(rt.vqgan, disc, VQGANTrainConfig(),
                                           steps_per_dispatch=Kv)
    g_opt, d_opt = vinitk(g_vars, d_params)
    data_k = jnp.broadcast_to(data[None], (Kv,) + data.shape)
    g_vars, d_params, g_opt, d_opt, m = vstepk(g_vars, d_params, g_opt,
                                               d_opt, data_k)  # compile
    jax.block_until_ready(m["g_loss"])
    n_disp = max(1, iters // 4)
    t0 = time.perf_counter()
    for _ in range(n_disp):
        g_vars, d_params, g_opt, d_opt, m = vstepk(
            g_vars, d_params, g_opt, d_opt, data_k)
    jax.block_until_ready(m["g_loss"])
    results["vqgan_train_steps_per_sec_b4_k4"] = n_disp * Kv / (
        time.perf_counter() - t0)

    return {"name": "training_throughput", **results}


BENCHES = {
    1: ("text2sound_single", lambda rt: bench_text2sound_single(rt)),
    2: ("text2sound_batched", lambda rt: bench_text2sound_batched(rt)),
    3: ("sound2sound_inpaint", lambda rt: bench_sound2sound_inpaint(rt)),
    4: ("track_render", lambda rt: bench_track_render(rt)),
    5: ("training", lambda rt: bench_training(rt)),
}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=int, default=None,
                        help="run one config (1-5); default all")
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)

    rt = _runtime()
    todo = [args.config] if args.config else sorted(BENCHES)
    results = []
    for n in todo:
        name, fn = BENCHES[n]
        print(f"== config {n}: {name} ==", file=sys.stderr, flush=True)
        r = fn(rt)
        new = r if isinstance(r, list) else [r]
        results.extend(new)
        for item in new:
            print(json.dumps(item), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
