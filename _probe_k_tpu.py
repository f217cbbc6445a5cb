import sys
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from diffusynth_tpu.configs import UNetConfig
from diffusynth_tpu.nn.unet import ConditionedUnet
from diffusynth_tpu.train.lora import init_lora, apply_lora, make_lora_train_step
from diffusynth_tpu.train.diffusion_train import p_losses, _dtype_of
from diffusynth_tpu.diffusion.schedule import Schedule

dtype = _dtype_of("bfloat16") if "--bf16" in sys.argv else None
cfgU = UNetConfig(down_dims=(8, 8, 16, 32), up_dims=(32, 32, 16, 8), label_emb_dim=16)
unet = ConditionedUnet(cfgU, dtype=dtype)
rng = np.random.default_rng(0)
B, K, T = 4, 8, 50
x1 = jnp.asarray(rng.standard_normal((B, 8, 8, 4)), jnp.float32)
c1 = jnp.asarray(rng.standard_normal((B, 16)), jnp.float32)
uncond = jnp.zeros(16)
base = jax.jit(unet.init)(jax.random.key(0), x1, jnp.zeros(B, jnp.int32), c1)
sched = Schedule.linear(T)
consts = (jnp.asarray(sched.sqrt_alphas_cumprod, jnp.float32),
          jnp.asarray(sched.sqrt_one_minus_alphas_cumprod, jnp.float32))
data = jnp.asarray(rng.standard_normal((40, K, B, 8, 8, 4)), jnp.float32)
cond = jnp.asarray(rng.standard_normal((40, K, B, 16)), jnp.float32)
ev_x = jnp.asarray(rng.standard_normal((64, 8, 8, 4)), jnp.float32)
ev_c = jnp.asarray(rng.standard_normal((64, 16)), jnp.float32)
ev_t = jax.random.randint(jax.random.key(5), (64,), 0, T)
def ev(lora, alpha=16.0):
    m = apply_lora(base, lora, alpha)
    return float(jax.jit(p_losses, static_argnums=(0,))(unet.apply, m, jax.random.key(9), ev_x, ev_t, ev_c, consts))

init_fn, step_fn = make_lora_train_step(unet, timesteps=T, lr=1e-3, steps_per_dispatch=K)
lora = init_lora(base, jax.random.key(1), 4)
st = init_fn(lora)
key = jax.random.key(2)
rep = []
for i in range(40):
    key, sub = jax.random.split(key)
    lora, st, loss = step_fn(base, lora, st, sub, data[i], cond[i], uncond)
    rep.extend([float(v) for v in loss])
print(f"platform={jax.default_backend()} dtype={dtype}: train-loss last10 "
      f"{np.mean(rep[-10:]):.4f}  ext eval alpha16 {ev(lora):.4f}")
