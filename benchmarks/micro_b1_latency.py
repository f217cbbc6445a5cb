"""Small-batch p50 latency: python step loop vs windowed scans.

The b1 text->wav path is dispatch-bound through the axon tunnel: each of
the 20 python-loop steps pays a host->device RPC that dwarfs the tiny
batch-2 (CFG) device step. loop_mode="window" scans W consecutive steps
per dispatch (sampler.py), cutting the RPC count by W; RESULTS_r2.md
showed windows LOSE at b64 because scanned programs containing the
Mosaic attention custom-calls run pathologically — so here the window
runtime also disables the Pallas kernels (fused_kernels=False), which at
b1 costs little device time.

Run: python -m benchmarks.micro_b1_latency [--steps 20] [--batch 1]
Prints one JSON line per variant: {variant, p50_s, compile_s}.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import numpy as np


def measure(loop_mode: str, fused, batch: int, steps: int, n_runs: int = 7):
    from diffusynth_tpu.configs import AppConfig
    from diffusynth_tpu.pipelines import DiffuSynthRuntime, Text2SoundPipeline
    from diffusynth_tpu.text import CachedTextEncoder, HashTextEncoder

    app = AppConfig()
    app = dataclasses.replace(
        app, unet=dataclasses.replace(app.unet, fused_kernels=fused))
    rt = DiffuSynthRuntime(
        app, text_encoder=CachedTextEncoder(HashTextEncoder(512)), seed=0,
        loop_mode=loop_mode)
    pipe = Text2SoundPipeline(rt)

    def run(seed):
        return pipe("a bright organ", "noise", batchsize=batch,
                    duration_sec=3.0, steps=steps, cfg=6.0, seed=seed,
                    return_audio=True)

    t0 = time.time()
    run(0)
    compile_s = time.time() - t0
    times = []
    for i in range(1, 1 + n_runs):
        t0 = time.time()
        run(i)
        times.append(time.time() - t0)
    return {"variant": f"{loop_mode}/fused={fused}", "batch": batch,
            "steps": steps, "p50_s": round(float(np.median(times)), 4),
            "min_s": round(float(np.min(times)), 4),
            "compile_s": round(compile_s, 1)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--variants", default="python/auto,window/off,window/auto")
    args = p.parse_args()

    for v in args.variants.split(","):
        loop_mode, fused_s = v.split("/")
        fused = {"auto": None, "off": False, "on": True}[fused_s]
        print(json.dumps(measure(loop_mode, fused, args.batch, args.steps)),
              flush=True)


if __name__ == "__main__":
    main()
