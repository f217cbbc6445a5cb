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
import sys
import time

import numpy as np


def main():
    import dataclasses
    import os

    import jax

    from diffusynth_tpu.configs import AppConfig
    from diffusynth_tpu.pipelines import DiffuSynthRuntime, Text2SoundPipeline
    from diffusynth_tpu.text import CachedTextEncoder, HashTextEncoder

    batch = 64
    steps = 50
    duration = 3.0  # 4 s nominal note -> width 64 (reference: text2sound.py:84)
    cfg_scale = 6.0

    app = AppConfig()
    # DIFFUSYNTH_BENCH_QUANTIZE=int8: W8A8 int8 U-Net convs (ops/quant.py).
    # Fidelity vs the float reference is recorded in docs/PARITY_E2E.md.
    quant = os.environ.get("DIFFUSYNTH_BENCH_QUANTIZE") or None
    if quant:
        app = dataclasses.replace(
            app, unet=dataclasses.replace(app.unet, quantize=quant))

    runtime = DiffuSynthRuntime(
        app, text_encoder=CachedTextEncoder(HashTextEncoder(512)),
        seed=0,
        loop_mode=os.environ.get("DIFFUSYNTH_BENCH_LOOP_MODE", "python"),
    )
    pipe = Text2SoundPipeline(runtime)

    def run(seed):
        res = pipe("a bright synthetic lead", "noise", batchsize=batch,
                   duration_sec=duration, steps=steps, cfg=cfg_scale,
                   sampler="ddim", seed=seed, return_audio=True)
        return res.audio

    # Warmup / compile (untimed).
    t0 = time.time()
    run(0)
    compile_s = time.time() - t0

    times = []
    for i in range(1, 4):
        t0 = time.time()
        run(i)
        times.append(time.time() - t0)

    p50 = float(np.median(times))
    timbres_per_sec = batch / p50
    result = {
        "metric": "timbres_per_sec_per_chip_b64_ddim50_cfg",
        "value": round(timbres_per_sec, 3),
        "unit": "timbres/s/chip",
        "vs_baseline": round(timbres_per_sec / 8.0, 3),
    }
    print(json.dumps(result))
    print(
        f"# p50 wall {p50:.3f}s for batch {batch} ({steps}-step DDIM + CFG + "
        f"VQGAN decode + ISTFT); compile {compile_s:.1f}s; "
        f"platform {jax.default_backend()}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
