import time, sys, numpy as np, jax, jax.numpy as jnp
sys.stdout.reconfigure(line_buffering=True)
from diffusynth_tpu.configs import AppConfig
from diffusynth_tpu.pipelines import DiffuSynthRuntime
from diffusynth_tpu.text import CachedTextEncoder, HashTextEncoder
from diffusynth_tpu.diffusion.schedule import respaced_timesteps

def run_case(dtype, cfg_scale, B=64, steps=50):
    rt = DiffuSynthRuntime(AppConfig(compute_dtype=dtype),
                           text_encoder=CachedTextEncoder(HashTextEncoder(512)), seed=0)
    shape = (B, 128, 64, 4)
    cond = jnp.broadcast_to(jnp.asarray(rt.encode_text(["lead"])), (B, 512))
    s = rt.make_sampler()
    s.respace(list(respaced_timesteps(1000, steps)))
    if cfg_scale != 1.0:
        s.activate_classifier_free_guidance(cfg_scale, rt.encode_text(["n"])[0])
    lat, _ = s.sample(rt.unet_variables, shape, jax.random.key(0), condition=cond)
    lat.block_until_ready()
    t0=time.time()
    for i in range(2):
        lat, _ = s.sample(rt.unet_variables, shape, jax.random.key(i+1), condition=cond)
    lat.block_until_ready()
    dt=(time.time()-t0)/2
    print(f"dtype={dtype} cfg={cfg_scale}: {dt:.2f}s -> {B/dt:.1f} timbres/s", flush=True)

run_case("bfloat16", 6.0)
run_case("bfloat16", 1.0)
run_case("float32", 6.0)
