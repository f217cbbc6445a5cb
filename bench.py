"""Headline benchmark: batched text2sound throughput on one chip.

Config (BASELINE.json #2): batch-64, 50-step DDIM with CFG, 4 s timbre
(latent width 64), full VQ-GAN decode + ISTFT to waveforms. Random weights -
generation cost is weight-independent. Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no numbers (BASELINE.md); the driver-set
target is batch-64/50-step in < 1 s on a v5e-8, i.e. 8 timbres/sec/chip.
vs_baseline = measured_timbres_per_sec_per_chip / 8.0 (>1 beats the target).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _preflight(timeout_s: int = 300) -> None:
    """Fail fast (nonzero exit) if the device is unreachable/wedged.

    A stuck server-side compile on the axon backend blocks every client
    (docs/SCAN_FAULT.md); without this guard bench.py would hang
    indefinitely instead of reporting a usable failure. The probe runs in
    a subprocess because a hung device op cannot be interrupted in-process.
    The generous timeout covers the ~2 min the chip can need to recover
    after a fault (first op may be slow once).
    """
    import subprocess

    probe = ("import jax, jax.numpy as jnp; "
             "x = jnp.ones((256, 256)); (x @ x).block_until_ready(); "
             "print('preflight ok', jax.default_backend())")
    try:
        subprocess.run([sys.executable, "-c", probe], timeout=timeout_s,
                       check=True, cwd=os.path.dirname(os.path.abspath(__file__)))
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError) as e:
        print(f"# bench preflight FAILED ({e.__class__.__name__}): device "
              f"unreachable or wedged — no measurement taken "
              f"(docs/SCAN_FAULT.md)", file=sys.stderr)
        raise SystemExit(2)


def main():
    import dataclasses

    import jax

    _preflight()

    from diffusynth_tpu.configs import AppConfig
    from diffusynth_tpu.pipelines import DiffuSynthRuntime, Text2SoundPipeline
    from diffusynth_tpu.text import CachedTextEncoder, HashTextEncoder

    batch = 64
    # DIFFUSYNTH_BENCH_SAMPLER / _STEPS: measure a non-headline sampler
    # config (e.g. dpmpp at 20 steps — quality-matched to ddim-50 per
    # benchmarks/sampler_convergence.py). The metric name is tagged below
    # so these runs can't be pasted as the 50-step-DDIM headline.
    sampler = os.environ.get("DIFFUSYNTH_BENCH_SAMPLER", "ddim")
    steps = int(os.environ.get("DIFFUSYNTH_BENCH_STEPS", "50"))
    duration = 3.0  # 4 s nominal note -> width 64 (reference: text2sound.py:84)
    cfg_scale = 6.0

    app = AppConfig()
    # W8A8 int8 U-Net convs (ops/quant.py) are the DEFAULT since round 3:
    # on the r3 TRAINED checkpoint the int8-vs-bf16 end-to-end drift is
    # BELOW the bf16-vs-f32 drift of the accepted production default on
    # every metric (pointwise latent 5.75% vs 6.08%, spectrogram 10.0% vs
    # 11.0%, band-energy 0.75% vs 0.84% — benchmarks/int8_control.py,
    # docs/PARITY_E2E.md "trained weights"). DIFFUSYNTH_BENCH_QUANTIZE=
    # none|bf16 opts out (tagged in the metric name).
    quant = os.environ.get("DIFFUSYNTH_BENCH_QUANTIZE", "int8")
    quant_tag = None
    if quant in ("", "none", "bf16"):
        quant, quant_tag = None, "bf16"
    elif quant != "int8":
        # An unknown value would silently measure the float path
        # (want_int8() gates on the exact string) — refuse instead.
        raise SystemExit(
            f"DIFFUSYNTH_BENCH_QUANTIZE={quant!r} not supported "
            f"(only 'int8'/'none'/'bf16'); refusing to mislabel a run")
    if quant:
        app = dataclasses.replace(
            app, unet=dataclasses.replace(app.unet, quantize=quant))
    # DIFFUSYNTH_BENCH_UNET=tpu128: the MXU-tile-aligned preset
    # (configs.UNET_PRESETS; NOT reference-parity — measures what
    # 128-aligned channel dims buy on this hardware, RESULTS_r2.md H11).
    preset = os.environ.get("DIFFUSYNTH_BENCH_UNET") or None
    if preset:
        from diffusynth_tpu.configs import UNET_PRESETS
        base = UNET_PRESETS[preset]
        app = dataclasses.replace(app, unet=dataclasses.replace(
            base, quantize=app.unet.quantize))

    # loop_mode: the runtime default ("scan" since r4 — measured faster
    # on device than the python step loop, RESULTS_r4.md section 8).
    # DIFFUSYNTH_BENCH_LOOP_MODE overrides and tags the metric.
    loop_mode = os.environ.get("DIFFUSYNTH_BENCH_LOOP_MODE")
    runtime_kw = {"loop_mode": loop_mode} if loop_mode else {}
    # DIFFUSYNTH_BENCH_MESH=auto (default): DP-shard the batch over all
    # visible devices when more than one is present (the v5e-8 target
    # deployment; VERDICT r4 task 1) — throughput is normalized per chip
    # either way. "off" pins one chip; an integer meshes that many.
    mesh = None
    mesh_env = os.environ.get("DIFFUSYNTH_BENCH_MESH", "auto")
    if mesh_env == "auto":
        if jax.device_count() > 1:
            from diffusynth_tpu.parallel.mesh import make_mesh
            mesh = make_mesh()
    elif mesh_env not in ("off", ""):
        from diffusynth_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(int(mesh_env))
    n_chips = 1 if mesh is None else int(mesh.devices.size)
    if mesh is not None:
        runtime_kw["mesh"] = mesh
    from diffusynth_tpu.ops.dispatch import describe_fences
    print(f"# kernel fences: {describe_fences()}; "
          f"devices: {jax.device_count()} (mesh: "
          f"{'none' if mesh is None else n_chips})", file=sys.stderr)
    runtime = DiffuSynthRuntime(
        app, text_encoder=CachedTextEncoder(HashTextEncoder(512)),
        seed=0, **runtime_kw,
    )
    pipe = Text2SoundPipeline(runtime)

    # Headline audio format: WAV-ready PCM16 produced on device — the
    # serving default and byte-identical to the host WAV conversion
    # (runtime.py decode; native dsyn_wav_write), so the headline measures
    # the product's actual text->WAV surface instead of shipping f32
    # samples the user would immediately quantize. Worth ~0.4 s of tunnel
    # transfer at batch 64. DIFFUSYNTH_BENCH_AUDIO=f32 restores the
    # round-1/round-2 measurement convention (tagged in the metric name).
    audio_format = os.environ.get("DIFFUSYNTH_BENCH_AUDIO", "int16")

    from diffusynth_tpu.utils.aot_cache import global_stats

    n_runs = int(os.environ.get("DIFFUSYNTH_BENCH_RUNS", "5"))
    pipelined = os.environ.get("DIFFUSYNTH_BENCH_PIPELINED", "1") != "0"

    def measure(m_sampler: str, m_steps: int):
        """Warm up + time one (sampler, steps) config; returns a stats
        dict. 5 timed runs: the axon tunnel's wall-clock noise band is
        ~±0.5 s on a 10 s run (RESULTS_r2.md), so a 3-sample median can
        land a bad draw; 5 samples tighten the p50 for ~20 s extra."""

        def run(seed, fetch=True):
            res = pipe("a bright synthetic lead", "noise", batchsize=batch,
                       duration_sec=duration, steps=m_steps, cfg=cfg_scale,
                       sampler=m_sampler, seed=seed, return_audio=True,
                       audio_format=audio_format, fetch_audio=fetch)
            return res.audio

        # Warmup / compile (untimed).
        before = global_stats()
        t0 = time.time()
        run(0)
        compile_s = time.time() - t0
        # Cache state of THIS config's warmup (self-attribution, VERDICT
        # r3 weak #1): any aot-cache miss means a compile happened during
        # warmup; all-hits is a warm cache; bypass-only means the cache
        # was off (e.g. CPU backend). Delta-based so the second metric's
        # state is not polluted by the first config's counts.
        aot = {k: global_stats().get(k, 0) - before.get(k, 0)
               for k in ("hits", "misses", "bypass")}
        cache_state = ("cold" if aot["misses"] else
                       "warm" if aot["hits"] else "off")

        times = []
        for i in range(1, 1 + n_runs):
            t0 = time.time()
            run(i)
            times.append(time.time() - t0)
        p50_seq = float(np.median(times))

        # Pipelined (the r3 headline): fetch run i's audio while run
        # i+1's programs execute — the device->host PCM16 copy (~6 MB at
        # tunnel rates) and result marshaling stop serializing with
        # compute. This is the sustained text->WAV throughput a pipelined
        # server achieves; the sequential p50 above is the single-request
        # latency and stays in the stderr record.
        # DIFFUSYNTH_BENCH_PIPELINED=0 restores the r1/r2 sequential
        # headline semantics.
        p50_pipe = None
        if pipelined:
            marks = [time.time()]
            prev = None
            for i in range(1 + n_runs, 1 + 2 * n_runs):
                res = run(i, fetch=False)
                if prev is not None:
                    np.asarray(prev)      # overlapped with run i's compute
                    marks.append(time.time())
                prev = res
            np.asarray(prev)
            marks.append(time.time())
            p50_pipe = float(np.median(np.diff(marks)))

        # Device-time p50: one extra traced run (fetch off, so the trace
        # sees device compute without the tunnel transfer). This makes a
        # driver run self-attributing: wall >> device means tunnel/host
        # overhead, not a compute regression. Best-effort — a trace
        # failure must not kill the headline measurement.
        device_s = None
        if os.environ.get("DIFFUSYNTH_BENCH_DEVICE_TIME", "1") != "0":
            try:
                from benchmarks.device_time import device_time_ms
                device_s = round(device_time_ms(
                    lambda: run(99, fetch=False), iters=1, warmup=0) / 1e3,
                    3)
            except Exception as e:  # noqa: BLE001
                print(f"# device-time trace failed ({type(e).__name__}: "
                      f"{e}); reporting wall only", file=sys.stderr)

        return {"p50_pipe": p50_pipe, "p50_seq": p50_seq,
                "device_s": device_s, "compile_s": compile_s,
                "cache": cache_state, "aot": aot}

    def emit(m_sampler, m_steps, stats, base_metric):
        p50 = stats["p50_pipe"] if pipelined else stats["p50_seq"]
        timbres_per_sec = batch / p50 / n_chips
        # Non-default knobs change WHAT is measured — tag the metric so a
        # knob run can't be pasted as the reference-parity headline
        # number. "seq" tags the sequential (r1/r2 convention) mode; the
        # default (untagged) headline is PIPELINED inter-arrival
        # throughput since r3, and vs_baseline compares it against the
        # 8.0 timbres/s/chip target (BASELINE.json) under that convention.
        knobs = [k for k in (quant_tag, preset,
                             loop_mode if loop_mode != "scan" else None,
                             f"dp{n_chips}" if n_chips > 1 else None,
                             audio_format if audio_format != "int16"
                             else None,
                             None if pipelined else "seq")
                 if k]
        metric = base_metric + ("_" + "_".join(knobs) if knobs else "")
        result = {
            "metric": metric,
            "value": round(timbres_per_sec, 3),
            "unit": "timbres/s/chip",
            "vs_baseline": round(timbres_per_sec / 8.0, 3),
            "mode": "pipelined" if pipelined else "sequential",
            "wall_s_p50": round(p50, 3),
            "seq_s_p50": round(stats["p50_seq"], 3),
            "device_s": stats["device_s"],
            "compile_s": round(stats["compile_s"], 1),
            "cache": stats["cache"],
            "aot": {k: v for k, v in stats["aot"].items() if v},
        }
        print(json.dumps(result))
        p50_pipe = stats["p50_pipe"]
        pipe_note = (f"pipelined p50 {p50_pipe:.3f}s / sequential p50 "
                     f"{stats['p50_seq']:.3f}s" if p50_pipe is not None
                     else f"sequential p50 {stats['p50_seq']:.3f}s "
                     f"(pipelining off)")
        print(
            f"# {pipe_note} for batch {batch} ({m_steps}-step "
            f"{m_sampler.upper()} + CFG + "
            f"VQGAN decode + ISTFT); compile {stats['compile_s']:.1f}s; "
            f"platform {jax.default_backend()}",
            file=sys.stderr,
        )

    headline_base = ("timbres_per_sec_per_chip_b64_ddim50_cfg"
                     if (sampler, steps) == ("ddim", 50)
                     else f"timbres_per_sec_per_chip_b64_{sampler}{steps}"
                          f"_cfg")
    emit(sampler, steps, measure(sampler, steps), headline_base)

    # Second tracked metric (VERDICT r4 task 8): the QUALITY-MATCHED
    # configuration — dpmpp-25 scores the same timbre-encoder Inception
    # Score as ddim-50 in every numerics (benchmarks/quality_leg.py,
    # RESULTS_r4.md section 4) at ~2x the throughput. Emitted as its own
    # JSON line so the 2x claim is a tracked artifact, not a doc claim.
    # Skipped when the headline config was overridden (the knob run is
    # already non-default) or via DIFFUSYNTH_BENCH_QUALITY_MATCHED=0.
    if ((sampler, steps) == ("ddim", 50)
            and os.environ.get("DIFFUSYNTH_BENCH_QUALITY_MATCHED", "1")
            != "0"):
        emit("dpmpp", 25, measure("dpmpp", 25),
             "timbres_per_sec_per_chip_b64_dpmpp25_cfg")


if __name__ == "__main__":
    main()
