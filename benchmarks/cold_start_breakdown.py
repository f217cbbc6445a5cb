"""Attribute the cached cold start phase by phase (VERDICT r3 task #5).

Round 3 measured first-audio-from-process-start at 65 s (b64) / 38 s (b1)
with a warm AOT cache, and hand-waved the non-load time as "imports +
device handshake + the actual first run". This script times each phase of
one cold start so the number is attributable and any recoverable slack is
visible:

    interpreter -> import jax -> import framework -> device handshake
    -> model init (jitted inits; AOT loads) -> text encode
    -> sampler program (AOT load + first 50-step run)
    -> decode program (AOT load + first run) -> audio fetch

One process = one cold start; run twice for the cold/warm-cache pair.

Run: cd /root/repo && python -u -m benchmarks.cold_start_breakdown --batch 64
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_T0 = time.time()
_PHASES = []


def mark(name: str) -> None:
    now = time.time()
    prev = _PHASES[-1][1] if _PHASES else _T0
    _PHASES.append((name, now, now - prev))
    print(f"[{now - _T0:7.1f}s] +{now - prev:6.1f}s  {name}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()

    # Interpreter start -> this line (python startup + argparse).
    mark("interpreter+script start")

    import jax
    mark("import jax")

    from diffusynth_tpu.configs import AppConfig
    from diffusynth_tpu.pipelines import DiffuSynthRuntime, Text2SoundPipeline
    from diffusynth_tpu.text import CachedTextEncoder, HashTextEncoder
    mark("import framework")

    import jax.numpy as jnp
    jnp.ones((8, 8)).block_until_ready()
    mark(f"device handshake ({jax.default_backend()})")

    import dataclasses

    # Match the production/bench default (int8 W8A8 U-Net convs) so the
    # attribution describes the programs a user actually cold-starts —
    # a bf16 run here would miss the cache bench/serving populate and
    # time a compile instead (caught live: 250 s "load" that was really
    # a bf16 compile). DIFFUSYNTH_BENCH_QUANTIZE=none opts out.
    app = AppConfig()
    if os.environ.get("DIFFUSYNTH_BENCH_QUANTIZE", "int8") == "int8":
        app = dataclasses.replace(
            app, unet=dataclasses.replace(app.unet, quantize="int8"))

    rt = DiffuSynthRuntime(
        app, text_encoder=CachedTextEncoder(HashTextEncoder(512)),
        seed=0)
    mark("runtime init (model inits; vqgan_init/unet_init AOT)")

    pipe = Text2SoundPipeline(rt)
    rt.encode_text(["a bright synthetic lead"])
    mark("text encode")

    # First audio through the EXACT bench/production call path (a
    # hand-rolled sampler call lowers a slightly different program and
    # misses the cache bench populates — caught live, r4). The phase
    # split comes from the aot-cache load prints + the steady-state run
    # below: first-audio = loads + lowering/trace + one run.
    def run(seed):
        res = pipe("a bright synthetic lead", "noise",
                   batchsize=args.batch, duration_sec=3.0,
                   steps=args.steps, cfg=6.0, seed=seed,
                   return_audio=True, audio_format="int16")
        return res.audio

    import numpy as np

    wav = np.asarray(run(1))
    mark(f"first audio (sampler+decode programs + {args.steps}-step run "
         f"+ fetch)")

    t0 = time.time()
    np.asarray(run(2))
    steady_s = time.time() - t0
    mark("steady-state second run")

    total = time.time() - _T0
    from diffusynth_tpu.utils.aot_cache import global_stats
    print(json.dumps({
        "batch": args.batch, "steps": args.steps,
        "total_s": round(total, 1),
        "steady_state_run_s": round(steady_s, 1),
        "phases": {n: round(d, 1) for n, _, d in _PHASES},
        "aot": global_stats(),
        "audio_shape": list(wav.shape),
        "cache_env": os.environ.get("DIFFUSYNTH_AOT_CACHE", "<unset>"),
    }), flush=True)


if __name__ == "__main__":
    main()
