import time, sys, numpy as np, jax, jax.numpy as jnp
sys.stdout.reconfigure(line_buffering=True)
from diffusynth_tpu.configs import UNetConfig
from diffusynth_tpu.nn.unet import ConditionedUnet

B, H, W = 128, 128, 64
x = jnp.zeros((B, H, W, 4))
t = jnp.zeros((B,), jnp.int32)
c = jnp.zeros((B, 512))

for dt_name, dt in [("bf16", jnp.bfloat16), ("f32", None)]:
    unet = ConditionedUnet(UNetConfig(), dtype=dt)
    params = unet.init(jax.random.key(0), x[:1], t[:1], c[:1])
    fn = jax.jit(lambda p, x, t, c: unet.apply(p, x, t, c))
    lowered = fn.lower(params, x, t, c)
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        print(f"{dt_name}: flops={ca.get('flops',0)/1e9:.1f}G bytes={ca.get('bytes accessed',0)/1e9:.2f}GB", flush=True)
    except Exception as e:
        print(f"{dt_name}: cost_analysis failed {e}", flush=True)
    out = fn(params, x, t, c); out.block_until_ready()
    t0 = time.time()
    for _ in range(5):
        out = fn(params, x, t, c)
    out.block_until_ready()
    dtms = (time.time()-t0)/5*1000
    print(f"{dt_name}: unet fwd b{B}: {dtms:.1f} ms", flush=True)
