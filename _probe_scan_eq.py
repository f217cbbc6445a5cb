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
sub = jax.random.key(77)
uncond = jnp.zeros(512)
cp = lambda t: jax.tree_util.tree_map(jnp.copy, t)

K = 8
init8, step8 = make_lora_train_step(unet, timesteps=1000, lr=1e-3, steps_per_dispatch=K)
init1, step1 = make_lora_train_step(unet, timesteps=1000, lr=1e-3, steps_per_dispatch=1)

l8, s8, loss8 = step8(base, cp(lora0), init8(cp(lora0)), sub, lat, cond, uncond)
l8b, s8b, loss8b = step8(base, cp(lora0), init8(cp(lora0)), sub, lat, cond, uncond)
d_det = max(float(jnp.abs(x - y).max()) for x, y in
            zip(jax.tree_util.tree_leaves(l8), jax.tree_util.tree_leaves(l8b)))
print("K=8 determinism max|diff|:", d_det)
print("K=8 losses:", [round(float(v), 4) for v in loss8])

l1, s1 = cp(lora0), init1(cp(lora0))
keys = jax.random.split(sub, K)
seq_losses = []
for j in range(K):
    l1, s1, lo = step1(base, l1, s1, keys[j], lat[j], cond[j], uncond)
    seq_losses.append(round(float(lo), 4))
print("K=1 sequential losses:", seq_losses)
d = max(float(jnp.abs(x - y).max()) for x, y in
        zip(jax.tree_util.tree_leaves(l8), jax.tree_util.tree_leaves(l1)))
rel = max(float(jnp.abs(x).max()) for x in jax.tree_util.tree_leaves(l1))
print(f"returned-adapter max|scan - sequential| = {d:.3e} (param scale {rel:.3e})")
