import jax, jax.numpy as jnp, numpy as np
from diffusynth_tpu.configs import AppConfig
from diffusynth_tpu.pipelines import DiffuSynthRuntime
from diffusynth_tpu.text import CachedTextEncoder, HashTextEncoder
from diffusynth_tpu.train import SyntheticNSynthDataset
from diffusynth_tpu.train.checkpoints import Checkpointer
from diffusynth_tpu.train.lora import init_lora, apply_lora, merge_lora
from diffusynth_tpu.train.diffusion_train import p_losses
from diffusynth_tpu.diffusion.schedule import Schedule
from diffusynth_tpu.train.run import _condition_lookup
from benchmarks.lora_learning import ShiftedDataset

app = AppConfig(); a = app.audio
text = CachedTextEncoder(HashTextEncoder(512))
rt = DiffuSynthRuntime(app, text_encoder=text, seed=0)
ck = Checkpointer("runs/r3_trained/models")
base = ck.restore("r3", "UNet", {"variables": rt.unet_variables, "step": 0})["variables"]
tmpl = {"variables": init_lora(base, jax.random.key(0), 8), "step": 0}
lora = ck.restore("r3", "UNet_lora", tmpl)["variables"]

# adapter magnitude diagnostics
bn = [float(jnp.abs(v["b"]).max()) for v in lora.values()]
an = [float(jnp.abs(v["a"]).max()) for v in lora.values()]
print("adapter |B|max: min/med/max", np.min(bn), np.median(bn), np.max(bn))
print("adapter |A|max: min/med/max", np.min(an), np.median(an), np.max(an))

sched = Schedule.linear(1000)
consts = (jnp.asarray(sched.sqrt_alphas_cumprod, jnp.float32),
          jnp.asarray(sched.sqrt_one_minus_alphas_cumprod, jnp.float32))
unet = rt.unet
lookup = _condition_lookup(512)
ds = ShiftedDataset(SyntheticNSynthDataset(n=256, shape=(a.latent_height, a.vae_scale*16, a.channels)))
data, attrs = ds.get_batch(np.arange(32))
cond = jnp.asarray(lookup(attrs)); x = jnp.asarray(data)
t = jax.random.randint(jax.random.key(200), (32,), 0, 1000)
ev = jax.jit(lambda params: p_losses(unet.apply, params, jax.random.key(100), x, t, cond, consts))
print("base loss:", float(ev(base)))
print("merged(alpha=16) loss:", float(ev(merge_lora(base, lora, alpha=16.0))))
print("apply_lora(alpha=16) loss:", float(ev(apply_lora(base, lora, 16.0))))
print("merged(alpha=2) loss:", float(ev(merge_lora(base, lora, alpha=2.0))))
print("merged(alpha=0.5) loss:", float(ev(merge_lora(base, lora, alpha=0.5))))
