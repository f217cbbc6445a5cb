import time, sys, numpy as np, jax, jax.numpy as jnp
sys.stdout.reconfigure(line_buffering=True)
from diffusynth_tpu.ops.linear_attention import linear_attention_jnp, linear_attention_pallas

B, N, h, d = 128, 8192, 4, 32
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, N, h, d)).astype(np.float32))
k = jnp.asarray(rng.standard_normal((B, N, h, d)).astype(np.float32))
v = jnp.asarray(rng.standard_normal((B, N, h, d)).astype(np.float32))
scale = d ** -0.5

ref_fn = jax.jit(lambda q,k,v: linear_attention_jnp(q,k,v,scale))
ref = ref_fn(q,k,v); ref.block_until_ready()

q2, k2, v2 = (a.reshape(B,N,h*d) for a in (q,k,v))
pl_out = linear_attention_pallas(q2,k2,v2,h,d,scale); pl_out.block_until_ready()
err = float(jnp.max(jnp.abs(pl_out.reshape(B,N,h,d) - ref)))
print(f"pallas vs jnp max err: {err:.2e}", flush=True)

def bench(fn, *args, iters=20):
    outs = []
    t0=time.time()
    for _ in range(iters):
        outs.append(fn(*args))
    jax.block_until_ready(outs)
    return (time.time()-t0)/iters*1000

print(f"jnp attention:    {bench(ref_fn, q, k, v):.2f} ms", flush=True)
print(f"pallas attention: {bench(lambda a,b,c: linear_attention_pallas(a,b,c,h,d,scale), q2, k2, v2):.2f} ms", flush=True)
