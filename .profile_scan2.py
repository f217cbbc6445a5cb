import time, sys, numpy as np, jax, jax.numpy as jnp
sys.stdout.reconfigure(line_buffering=True)
from diffusynth_tpu.configs import AppConfig
from diffusynth_tpu.pipelines import DiffuSynthRuntime
from diffusynth_tpu.text import CachedTextEncoder, HashTextEncoder
from diffusynth_tpu.diffusion.schedule import respaced_timesteps

rt = DiffuSynthRuntime(AppConfig(), text_encoder=CachedTextEncoder(HashTextEncoder(512)), seed=0)
B, steps = 64, 50
shape = (B, 128, 64, 4)
cond = jnp.broadcast_to(jnp.asarray(rt.encode_text(["lead"])), (B, 512))
s = rt.make_sampler()
s.respace(list(respaced_timesteps(1000, steps)))
lat, _ = s.sample(rt.unet_variables, shape, jax.random.key(0), condition=cond)
lat.block_until_ready()
t0=time.time()
for i in range(2):
    lat, _ = s.sample(rt.unet_variables, shape, jax.random.key(i+1), condition=cond)
lat.block_until_ready()
dt=(time.time()-t0)/2
print(f"cfg=1 b{B}: {dt:.2f}s -> {B/dt:.1f} timbres/s", flush=True)
