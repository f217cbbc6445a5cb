import jax, jax.numpy as jnp, numpy as np, warnings
warnings.filterwarnings("ignore")
from diffusynth_tpu.configs import AppConfig
from diffusynth_tpu.nn.unet import ConditionedUnet
from diffusynth_tpu.train import SyntheticNSynthDataset, data_iterator
from diffusynth_tpu.train.checkpoints import Checkpointer
from diffusynth_tpu.train.lora import init_lora, apply_lora, make_lora_train_step
from diffusynth_tpu.train.diffusion_train import p_losses, _dtype_of
from diffusynth_tpu.diffusion.schedule import Schedule
from diffusynth_tpu.train.run import _condition_lookup
from benchmarks.lora_learning import ShiftedDataset

app = AppConfig(); a = app.audio
unet = ConditionedUnet(app.unet, dtype=_dtype_of("bfloat16"))
tmpl = jax.jit(unet.init)(jax.random.key(0), jnp.zeros((2, 128, 64, 4)), jnp.zeros(2, jnp.int32), jnp.zeros((2, 512)))
ck = Checkpointer("runs/r3_trained/models")
base = ck.restore("r3", "UNet", {"variables": tmpl, "step": 0})["variables"]
lora0 = ck.restore("r3", "UNet_lora", {"variables": init_lora(base, jax.random.key(0), 8), "step": 0})["variables"]

ds = ShiftedDataset(SyntheticNSynthDataset(n=256, shape=(a.latent_height, a.vae_scale*16, a.channels)))
lookup = _condition_lookup(512)
it = data_iterator(ds, 8, seed=1)
batches = [next(it) for _ in range(8)]
lat = jnp.asarray(np.stack([b[0] for b in batches]), jnp.float32)
cond = jnp.asarray(np.stack([lookup(b[1]) for b in batches]), jnp.float32)
uncond = jnp.zeros(512)
cp = lambda t: jax.tree_util.tree_map(jnp.copy, t)

sched = Schedule.linear(1000)
consts = (jnp.asarray(sched.sqrt_alphas_cumprod, jnp.float32),
          jnp.asarray(sched.sqrt_one_minus_alphas_cumprod, jnp.float32))
ev_data, ev_attrs = ds.get_batch(np.arange(32))
ev_x = jnp.asarray(ev_data); ev_c = jnp.asarray(lookup(ev_attrs))
ev_t = jax.random.randint(jax.random.key(5), (32,), 0, 1000)
evj = jax.jit(lambda m: p_losses(unet.apply, m, jax.random.key(9), ev_x, ev_t, ev_c, consts))
def ev(l): return float(evj(apply_lora(base, l, 16.0)))

print("saved-state eval loss:", ev(lora0))
# tiny random perturbation (Adam-step scale)
pert = jax.tree_util.tree_map(
    lambda x: x + 1e-3 * jax.random.normal(jax.random.key(42), x.shape), lora0)
print("saved + N(0,1e-3) eval loss:", ev(pert))
pert2 = jax.tree_util.tree_map(
    lambda x: x + 1e-4 * jax.random.normal(jax.random.key(43), x.shape), lora0)
print("saved + N(0,1e-4) eval loss:", ev(pert2))

K = 8
init8, step8 = make_lora_train_step(unet, timesteps=1000, lr=1e-3, steps_per_dispatch=K)
l8, s8, loss8 = step8(base, cp(lora0), init8(cp(lora0)), jax.random.key(77), lat, cond, uncond)
print("probe-dispatch losses:", [round(float(v), 4) for v in loss8])
print("probe-returned-state eval loss:", ev(l8))
# a second dispatch from the returned state (warm opt)
it2 = data_iterator(ds, 8, seed=99)
b2 = [next(it2) for _ in range(8)]
lat2 = jnp.asarray(np.stack([b[0] for b in b2]), jnp.float32)
cond2 = jnp.asarray(np.stack([lookup(b[1]) for b in b2]), jnp.float32)
l8c, s8c, loss8c = step8(base, l8, s8, jax.random.key(78), lat2, cond2, uncond)
print("2nd dispatch losses:", [round(float(v), 4) for v in loss8c])
print("2nd returned-state eval loss:", ev(l8c))
