import time, sys, numpy as np, jax, jax.numpy as jnp
sys.stdout.reconfigure(line_buffering=True)
from diffusynth_tpu.configs import AppConfig
from diffusynth_tpu.pipelines import DiffuSynthRuntime
from diffusynth_tpu.text import CachedTextEncoder, HashTextEncoder
from diffusynth_tpu.diffusion.schedule import respaced_timesteps

rt = DiffuSynthRuntime(AppConfig(), text_encoder=CachedTextEncoder(HashTextEncoder(512)), seed=0)
B, W, steps = 64, 64, 50
shape = (B, 128, W, 4)
cond = jnp.asarray(rt.encode_text(["lead"]))
cond = jnp.broadcast_to(cond, (B, 512))
uncond = rt.encode_text(["noise"])[0]

s = rt.make_sampler()
s.respace(list(respaced_timesteps(1000, steps)))
s.activate_classifier_free_guidance(6.0, uncond)

t0=time.time()
lat, _ = s.sample(rt.unet_variables, shape, jax.random.key(0), condition=cond)
lat.block_until_ready()
print(f"sampler b{B} {steps}-step CFG: compile+run {time.time()-t0:.1f}s")
t0=time.time()
for i in range(3):
    lat, _ = s.sample(rt.unet_variables, shape, jax.random.key(i+1), condition=cond)
lat.block_until_ready()
dt = (time.time()-t0)/3
print(f"sampler cached: {dt:.3f}s -> {B/dt:.1f} timbres/s (sampling only)")

t0=time.time()
spec, audio = rt.decode_latents(lat, quantize=True)
audio.block_until_ready()
print(f"decode b{B}: compile+run {time.time()-t0:.1f}s")
t0=time.time()
for i in range(3):
    spec, audio = rt.decode_latents(lat, quantize=True)
audio.block_until_ready()
print(f"decode cached: {(time.time()-t0)/3:.3f}s")
