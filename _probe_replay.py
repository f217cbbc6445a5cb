import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from diffusynth_tpu.configs import AppConfig
from diffusynth_tpu.nn.unet import ConditionedUnet
from diffusynth_tpu.train import SyntheticNSynthDataset, data_iterator
from diffusynth_tpu.train.checkpoints import Checkpointer
from diffusynth_tpu.train.lora import init_lora, apply_lora
from diffusynth_tpu.train.diffusion_train import p_losses, _dtype_of
from diffusynth_tpu.diffusion.schedule import Schedule
from diffusynth_tpu.train.run import _condition_lookup
from benchmarks.lora_learning import ShiftedDataset

app = AppConfig(); a = app.audio
unet = ConditionedUnet(app.unet, dtype=_dtype_of("bfloat16"))
rng_init = jax.random.key(0)
x0 = jnp.zeros((1, a.latent_height, 16*a.vae_scale, a.channels)); 
import warnings; warnings.filterwarnings("ignore")
base_tmpl = unet.init(jax.random.key(0), jnp.zeros((2, 128, 64, 4)), jnp.zeros(2, jnp.int32), jnp.zeros((2, 512)))
ck = Checkpointer("runs/r3_trained/models")
base = ck.restore("r3", "UNet", {"variables": base_tmpl, "step": 0})["variables"]
lora = ck.restore("r3", "UNet_lora", {"variables": init_lora(base, jax.random.key(0), 8), "step": 0})["variables"]

ds = ShiftedDataset(SyntheticNSynthDataset(n=256, shape=(a.latent_height, a.vae_scale*16, a.channels)))
lookup = _condition_lookup(512)
it = data_iterator(ds, 8, seed=1)
K, n_disp = 8, 200
key = jax.random.key(1)
for d in range(n_disp):
    batches = [next(it) for _ in range(K)]
    key, sub = jax.random.split(key)
# final dispatch: batches, sub
keys = jax.random.split(sub, K)
sched = Schedule.linear(1000)
consts = (jnp.asarray(sched.sqrt_alphas_cumprod, jnp.float32),
          jnp.asarray(sched.sqrt_one_minus_alphas_cumprod, jnp.float32))
data, attrs = batches[-1]
cond = jnp.asarray(lookup(attrs), jnp.float32)
lat = jnp.asarray(data, jnp.float32)
k_drop, k_t, k_noise = jax.random.split(keys[-1], 3)
drop = jax.random.bernoulli(k_drop, 0.1, (8,))
cond = jnp.where(drop[:, None], jnp.zeros((512,))[None, :], cond)
t = jax.random.randint(k_t, (8,), 0, 1000)
merged = apply_lora(base, lora, 16.0)
loss = p_losses(unet.apply, merged, k_noise, lat, t, cond, consts)
print("replayed final-substep loss with SAVED adapter (alpha16):", float(loss))
loss_b = p_losses(unet.apply, base, k_noise, lat, t, cond, consts)
print("same batch, base:", float(loss_b))
