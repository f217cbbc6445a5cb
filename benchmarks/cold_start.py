"""First-request latency (VERDICT r1 #4): cold p50 and warm p50 for
text2sound, batch 1 and batch 64.

Cold = fresh process, nothing compiled: runtime construction + jit of the
sampler step program + decode program + the request itself. Warm = the
immediately following identical request (cached executables). The
BASELINE.json north star is "text -> wav p50 latency".

Run one batch size per process (compile caches are per-process state):
    cd /root/repo && python -u -m benchmarks.cold_start 1
    cd /root/repo && python -u -m benchmarks.cold_start 64
"""

from __future__ import annotations

import sys
import time

import jax


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    t_proc = time.time()

    from diffusynth_tpu.configs import AppConfig
    from diffusynth_tpu.pipelines import DiffuSynthRuntime
    from diffusynth_tpu.pipelines.text2sound import Text2SoundPipeline

    import dataclasses
    import os

    app = AppConfig()
    # DIFFUSYNTH_COLD_FUSED=0: force the XLA-only U-Net (no Pallas site
    # kernels). The Mosaic kernel compiles through the axon tunnel cost
    # ~240 s of cold start for a ~17% warm-throughput win — this knob
    # measures the fast-cold end of that dial.
    if os.environ.get("DIFFUSYNTH_COLD_FUSED") == "0":
        app = dataclasses.replace(
            app, unet=dataclasses.replace(app.unet, fused_kernels=False))
    print(f"devices: {jax.devices()}; batch {batch}; "
          f"fused={app.unet.fused_kernels}", flush=True)
    t0 = time.time()
    rt = DiffuSynthRuntime(app)
    pipe = Text2SoundPipeline(rt)
    t_init = time.time() - t0
    print(f"runtime init (incl. param init on device): {t_init:.1f}s",
          flush=True)

    t0 = time.time()
    r = pipe("an organ note", negative_prompt="", batchsize=batch,
             duration_sec=3.0, steps=50, cfg=6.0, seed=1)
    cold = time.time() - t0
    print(f"COLD first request (b{batch}, 50-step DDIM+CFG+decode): "
          f"{cold:.1f}s  (process total {time.time()-t_proc:.1f}s)",
          flush=True)
    assert r.audio.shape[0] == batch and r.audio.dtype == "float32"

    warms = []
    for i in range(3):
        t0 = time.time()
        pipe("an organ note", negative_prompt="", batchsize=batch,
             duration_sec=3.0, steps=50, cfg=6.0, seed=2 + i)
        warms.append(time.time() - t0)
    warms.sort()
    print(f"WARM p50 (b{batch}): {warms[1]:.2f}s  (all: "
          f"{['%.2f' % w for w in warms]})", flush=True)


if __name__ == "__main__":
    main()
