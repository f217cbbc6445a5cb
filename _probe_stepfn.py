import jax, jax.numpy as jnp, numpy as np, warnings
warnings.filterwarnings("ignore")
from diffusynth_tpu.configs import AppConfig
from diffusynth_tpu.nn.unet import ConditionedUnet
from diffusynth_tpu.train import SyntheticNSynthDataset, data_iterator
from diffusynth_tpu.train.checkpoints import Checkpointer
from diffusynth_tpu.train.lora import init_lora, make_lora_train_step
from diffusynth_tpu.train.diffusion_train import _dtype_of
from diffusynth_tpu.train.run import _condition_lookup
from benchmarks.lora_learning import ShiftedDataset

app = AppConfig(); a = app.audio
unet = ConditionedUnet(app.unet, dtype=_dtype_of("bfloat16"))
base_tmpl = jax.jit(unet.init)(jax.random.key(0), jnp.zeros((2, 128, 64, 4)), jnp.zeros(2, jnp.int32), jnp.zeros((2, 512)))
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
lat = jnp.asarray(np.stack([b[0] for b in batches]), jnp.float32)
cond = jnp.asarray(np.stack([lookup(b[1]) for b in batches]), jnp.float32)

init_fn, step_fn = make_lora_train_step(unet, timesteps=1000, lr=1e-3, steps_per_dispatch=K)
st = init_fn(lora)
_, _, losses = step_fn(base, lora, st, sub, lat, cond, jnp.zeros(512))
print("step-machinery losses on saved adapter, replayed final dispatch:",
      [round(float(v), 4) for v in losses])
