import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from diffusynth_tpu.configs import UNetConfig
from diffusynth_tpu.nn.unet import ConditionedUnet
from diffusynth_tpu.train.lora import init_lora, apply_lora, make_lora_train_step
from diffusynth_tpu.train.diffusion_train import p_losses
from diffusynth_tpu.diffusion.schedule import Schedule

cfgU = UNetConfig(down_dims=(8, 8, 16, 32), up_dims=(32, 32, 16, 8), label_emb_dim=16)
unet = ConditionedUnet(cfgU)
rng = np.random.default_rng(0)
B, K, T = 4, 8, 50
x1 = jnp.asarray(rng.standard_normal((B, 8, 8, 4)), jnp.float32)
c1 = jnp.asarray(rng.standard_normal((B, 16)), jnp.float32)
uncond = jnp.zeros(16)
base = unet.init(jax.random.key(0), x1, jnp.zeros(B, jnp.int32), c1)
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
    return float(p_losses(unet.apply, m, jax.random.key(9), ev_x, ev_t, ev_c, consts))

for KK in (1, 8):
    init_fn, step_fn = make_lora_train_step(unet, timesteps=T, lr=1e-3, steps_per_dispatch=KK)
    lora = init_lora(base, jax.random.key(1), 4)
    st = init_fn(lora)
    key = jax.random.key(2)
    rep = []
    for i in range(40 if KK==8 else 320):
        key, sub = jax.random.split(key)
        if KK == 1:
            j, k = divmod(i, K)
            lora, st, loss = step_fn(base, lora, st, sub, data[j, k], cond[j, k], uncond)
            rep.append(float(loss))
        else:
            lora, st, loss = step_fn(base, lora, st, sub, data[i], cond[i], uncond)
            rep.extend([float(v) for v in loss])
    print(f"K={KK}: train-loss last10 {np.mean(rep[-10:]):.4f}  "
          f"ext eval alpha16 {ev(lora):.4f}  alpha2 {ev(lora, 2.0):.4f}")
