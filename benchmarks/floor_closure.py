"""Per-op device-time breakdown of the headline sampler step vs roofline
(VERDICT r3 task #3: either find H17+, or close the 8/s question with an
attributed floor writeup).

Captures one profiler trace around K executions of the production headline
step program (batch-64 CFG -> U-Net batch 128, int8 W8A8 default), sums the
'XLA Ops' plane per op, groups ops into categories, and prints:

    - total device ms/step, and the 50-step + decode projection
    - per-category ms (convolution/matmul = MXU work, fusions = elementwise
      + normalization HBM traffic, custom-calls = Mosaic kernels, copies)
    - the top-15 ops by time
    - roofline context: v5e-1 peaks (197 TFLOP/s bf16, 394 TOPS int8,
      ~819 GB/s HBM) against the measured U-Net forward cost
      (benchmarks/micro_unet.py: 16.9 TFLOP / ~79 GB HBM at batch 128 bf16)

Run: cd /root/repo && python -u -m benchmarks.floor_closure
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 50
BATCH = 64


def categorize(name: str) -> str:
    """Bucket an 'XLA Ops'-plane event name (e.g. '%convert_reduce_fusion.3
    = (f32[128]...' or '%fusion.937 = ...') by what the op IS."""
    n = name.lower().lstrip("%")
    if "custom-call" in n or "tpu_custom_call" in n or "mosaic" in n:
        return "mosaic custom-call"
    if "reduce_fusion" in n or "reduce_window" in n or n.startswith(
            ("reduce", "convert_reduce")):
        return "reduce fusion (GN stats / HBM)"
    if "convolution" in n or n.startswith("conv"):
        return "convolution (+epilogue fusions, MXU)"
    if n.startswith(("dot", "gemm")) or "dot_general" in n:
        return "matmul (MXU)"
    if n.startswith(("copy", "transpose", "bitcast", "reshape", "slice",
                     "concatenate", "dynamic")):
        return "copy/layout"
    if n.startswith(("all-reduce", "all-gather", "collective")):
        return "collective"
    if "fusion" in n:
        return "other fusion (elementwise/HBM)"
    return "other"


def main():
    import dataclasses

    from benchmarks.device_time import device_time_ms
    from diffusynth_tpu.configs import AppConfig
    from diffusynth_tpu.diffusion.schedule import respaced_timesteps
    from diffusynth_tpu.pipelines import DiffuSynthRuntime, Text2SoundPipeline
    from diffusynth_tpu.text import CachedTextEncoder, HashTextEncoder

    app = AppConfig()
    app = dataclasses.replace(
        app, unet=dataclasses.replace(app.unet, quantize="int8"))
    rt = DiffuSynthRuntime(
        app, text_encoder=CachedTextEncoder(HashTextEncoder(512)), seed=0)
    pipe = Text2SoundPipeline(rt)
    a = rt.config.audio
    width = a.width_from_duration(3.0)

    cond = jnp.broadcast_to(rt.encode_text(["a bright synthetic lead"]),
                            (BATCH, rt.text_encoder.feature_dim))
    uncond = rt.encode_text(["noise"])[0]
    s = pipe._sampler_for(STEPS, 6.0, uncond)
    shape = (BATCH, a.latent_height, width, a.channels)

    # Warm everything (AOT loads / compiles) once, untimed.
    latents, _ = s.sample(rt.unet_variables, shape, jax.random.key(0),
                          condition=cond)
    jax.block_until_ready(latents)

    def one_run():
        lat, _ = s.sample(rt.unet_variables, shape, jax.random.key(1),
                          condition=cond)
        return lat

    ms, by_op = device_time_ms(one_run, iters=1, warmup=0, breakdown=True)
    per_step = ms / STEPS
    print(f"\nheadline run device time: {ms:.0f} ms "
          f"({per_step:.1f} ms per {STEPS}-step-run step incl. overhead)")
    print(f"50-step + decode projection: {ms/1e3:.2f} s -> "
          f"{BATCH/(ms/1e3):.2f} timbres/s/chip device-bound ceiling")

    cats = {}
    for name, t in by_op:
        cats[categorize(name)] = cats.get(categorize(name), 0.0) + t
    total_ops = sum(cats.values())
    print(f"\nper-category device ms (ops-plane total {total_ops:.0f}):")
    for k, v in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {v:8.1f} ms  {v/total_ops:6.1%}  {k}")

    print("\ntop-15 ops:")
    for name, t in by_op[:15]:
        print(f"  {t:8.1f} ms  {name[:90]}")

    # Roofline context (v5e-1): measured U-Net fwd cost at batch 128.
    flops_per_step = 16.9e12          # benchmarks/micro_unet.py (bf16 b128)
    hbm_bytes_per_step = 79e9
    bf16_peak, int8_peak, hbm_bw = 197e12, 394e12, 819e9
    print(json.dumps({
        "device_ms_per_step": round(per_step, 1),
        "roofline_ms_bf16_compute": round(flops_per_step / bf16_peak * 1e3, 1),
        "roofline_ms_int8_compute": round(flops_per_step / int8_peak * 1e3, 1),
        "roofline_ms_hbm": round(hbm_bytes_per_step / hbm_bw * 1e3, 1),
        "steps_budget_ms_for_8ps": round((BATCH / 8.0 - 0.09) / STEPS * 1e3, 1),
    }, indent=2))


if __name__ == "__main__":
    main()
