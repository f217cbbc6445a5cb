"""LoRA adapter tests (beyond-reference; train/lora.py).

All on the tiny U-Net, CPU. Pins the contract: zero-init B means the
adapted model IS the base model; training moves only the adapter;
merge_lora equals on-the-fly application; the adapter checkpoint
round-trips and is small.
"""

import chex
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusynth_tpu.configs import DiffusionTrainConfig, UNetConfig
from diffusynth_tpu.nn.unet import ConditionedUnet
from diffusynth_tpu.train import Checkpointer
from diffusynth_tpu.train.lora import (
    apply_lora,
    init_lora,
    lora_num_params,
    make_lora_train_step,
    merge_lora,
    train_diffusion_lora,
)

SMALL_UNET = UNetConfig(down_dims=(8, 8, 16, 32), up_dims=(32, 32, 16, 8),
                        label_emb_dim=16)


@pytest.fixture(scope="module")
def base():
    unet = ConditionedUnet(SMALL_UNET)
    rng = np.random.default_rng(0)
    latents = jnp.asarray(rng.standard_normal((4, 8, 8, 4)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((4, 16)), jnp.float32)
    params = unet.init(jax.random.key(0), latents,
                       jnp.zeros(4, jnp.int32), cond)
    return unet, params, latents, cond


def test_zero_init_is_identity(base):
    unet, params, latents, cond = base
    lora = init_lora(params, jax.random.key(1), rank=4)
    merged = apply_lora(params, lora)
    t = jnp.zeros(4, jnp.int32)
    chex.assert_trees_all_close(
        unet.apply(merged, latents, t, cond),
        unet.apply(params, latents, t, cond), atol=0, rtol=0)


def test_adapter_is_small_and_targeted(base):
    _, params, _, _ = base
    lora = init_lora(params, jax.random.key(1), rank=4)
    n_base = sum(int(np.prod(x.shape))
                 for x in jax.tree_util.tree_leaves(params))
    assert lora_num_params(lora) < 0.35 * n_base
    # Attention-only adaptation: the projections are named to_qkv /
    # to_out_* / label_* (names mirror the torch state_dict, CLAUDE.md).
    only_attn = init_lora(params, jax.random.key(1), rank=4,
                          targets=["to_qkv", "to_out"])
    assert 0 < len(only_attn) < len(lora)
    assert all("to_qkv" in k or "to_out" in k for k in only_attn)


def test_train_moves_only_adapter_and_loss_decreases(base):
    unet, params, latents, cond = base
    lora = init_lora(params, jax.random.key(1), rank=4)
    init_fn, step_fn = make_lora_train_step(unet, timesteps=50, lr=2e-3)
    opt_state = init_fn(lora)
    uncond = jnp.zeros(16)
    first = last = None
    for i in range(30):
        lora, opt_state, loss = step_fn(
            params, lora, opt_state, jax.random.key(100 + i),
            latents, cond, uncond)
        first = float(loss) if first is None else first
        last = float(loss)
    assert last < first
    # The base params were never touched (read-only argument).
    b = jax.tree_util.tree_leaves(params)[0]
    assert np.all(np.isfinite(np.asarray(b)))
    # And the adapter now differs from the base model.
    merged = merge_lora(params, lora)
    t = jnp.zeros(4, jnp.int32)
    out_m = unet.apply(merged, latents, t, cond)
    out_b = unet.apply(params, latents, t, cond)
    assert float(jnp.max(jnp.abs(out_m - out_b))) > 1e-6


def test_merge_equals_on_the_fly(base):
    unet, params, latents, cond = base
    lora = init_lora(params, jax.random.key(2), rank=4)
    # Give B nonzero values so the merge is nontrivial.
    lora = jax.tree_util.tree_map(
        lambda x: x + 0.01 * jnp.ones_like(x), lora)
    t = jnp.zeros(4, jnp.int32)
    chex.assert_trees_all_close(
        unet.apply(merge_lora(params, lora), latents, t, cond),
        unet.apply(apply_lora(params, lora), latents, t, cond),
        atol=1e-6)


def test_multi_step_dispatch_matches_sequential(base):
    unet, params, latents, cond = base
    uncond = jnp.zeros(16)
    import optax
    for K in (1, 2):
        init_fn, step_fn = make_lora_train_step(
            unet, timesteps=50, optimizer=optax.sgd(1e-2),
            steps_per_dispatch=K)
        lora = init_lora(params, jax.random.key(1), rank=4)
        opt_state = init_fn(lora)
        if K == 1:
            keys = jax.random.split(jax.random.key(7), 2)
            for k in keys:
                lora, opt_state, _ = step_fn(
                    params, lora, opt_state, k, latents, cond, uncond)
            seq = lora
        else:
            stacked = jnp.stack([latents, latents])
            conds = jnp.stack([cond, cond])
            lora, opt_state, losses = step_fn(
                params, lora, opt_state, jax.random.key(7),
                stacked, conds, uncond)
            assert losses.shape == (2,)
            multi = lora
    # Same key folding as diffusion_train's multi-step: split(key, K)
    # equals the sequential splits only if we drive them identically, so
    # compare against a sequential run driven by the same sub-keys.
    init_fn, step_fn = make_lora_train_step(
        unet, timesteps=50, optimizer=optax.sgd(1e-2))
    lora = init_lora(params, jax.random.key(1), rank=4)
    opt_state = init_fn(lora)
    for k in jax.random.split(jax.random.key(7), 2):
        lora, opt_state, _ = step_fn(
            params, lora, opt_state, k, latents, cond, uncond)
    chex.assert_trees_all_close(multi, lora, atol=1e-6)


def test_loop_checkpoints_adapter(base, tmp_path):
    _, params, _, _ = base
    rng = np.random.default_rng(3)

    def it():
        while True:
            yield (rng.standard_normal((2, 8, 8, 4)).astype(np.float32),
                   {"instrument_str": ["bass_0", "flute_1"]})

    def lookup(attrs):
        return rng.standard_normal((2, 16)).astype(np.float32)

    cfg = DiffusionTrainConfig(batch_size=2, max_iter=4, save_steps=2,
                               timesteps=50, model_name="tiny_lora")
    ckpt = Checkpointer(str(tmp_path / "models"))
    from diffusynth_tpu.train.logging import MetricLogger
    lora, _ = train_diffusion_lora(
        SMALL_UNET, cfg, it(), lookup, np.zeros(16, np.float32),
        params, rank=4, checkpointer=ckpt,
        logger=MetricLogger(str(tmp_path / "runs"), use_tensorboard=False))
    assert ckpt.exists("tiny_lora", "UNet_lora")
    template = {"variables": init_lora(params, jax.random.key(0), rank=4),
                "step": 0}
    restored = ckpt.restore("tiny_lora", "UNet_lora", template)
    chex.assert_trees_all_close(restored["variables"], lora, atol=0)


def test_lora_step_sharded_matches_single(base):
    """DP over the 8-virtual-device mesh: the adapter step with a sharded
    batch + replicated (base, lora, opt) equals the single-device step."""
    from diffusynth_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    unet, params, latents, cond = base
    assert jax.device_count() == 8
    lat = np.asarray(jnp.concatenate([latents, latents]))      # batch 8
    cnd = np.asarray(jnp.concatenate([cond, cond]))
    uncond = jnp.zeros(16)
    import optax

    # SGD: the update is linear in the gradient, so the sharded psum's
    # reduction-order noise stays O(eps) in the params. (Adam divides by
    # sqrt(v): near-zero-gradient elements amplify that noise to O(lr).)
    init_fn, step_fn = make_lora_train_step(unet, timesteps=50,
                                            optimizer=optax.sgd(1e-2),
                                            uncondition_rate=0.0)

    lora1 = init_lora(params, jax.random.key(1), rank=4)
    l1, _, loss1 = step_fn(params, lora1, init_fn(lora1), jax.random.key(9),
                           jnp.asarray(lat), jnp.asarray(cnd), uncond)

    mesh = make_mesh(8)
    lora2 = init_lora(params, jax.random.key(1), rank=4)
    l2, _, loss2 = step_fn(
        replicate(params, mesh), replicate(lora2, mesh),
        replicate(init_fn(lora2), mesh), jax.random.key(9),
        shard_batch(lat, mesh), shard_batch(cnd, mesh),
        replicate(uncond, mesh))
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(l1),
                    jax.tree_util.tree_leaves(l2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_loop_best_gates_on_eval(base, tmp_path):
    """eval_fn best-gating: the UNet_lora checkpoint keeps the state with
    the lowest held-out eval, not the final state (RESULTS_r3.md "LoRA
    end-state instability")."""
    from diffusynth_tpu.train.logging import MetricLogger

    _, params, _, _ = base
    rng = np.random.default_rng(7)

    def it():
        while True:
            yield (rng.standard_normal((2, 8, 8, 4)).astype(np.float32),
                   {"instrument_str": ["a", "b"]})

    def lookup(attrs):
        return rng.standard_normal((2, 16)).astype(np.float32)

    # Scripted eval: improves at steps 2 and 4, then worsens — the saved
    # checkpoint must be the step-4 state.
    evals = {2: 1.0, 4: 0.5, 6: 2.0, 8: 3.0}
    seen_states = {}

    def eval_fn(lora, step):
        seen_states[step] = jax.tree_util.tree_map(np.asarray, lora)
        return evals[step]

    cfg = DiffusionTrainConfig(batch_size=2, max_iter=8, save_steps=100,
                               timesteps=50, model_name="bg")
    ckpt = Checkpointer(str(tmp_path / "models"))
    train_diffusion_lora(
        SMALL_UNET, cfg, it(), lookup, np.zeros(16, np.float32), params,
        rank=4, checkpointer=ckpt, eval_fn=eval_fn, eval_every=2,
        logger=MetricLogger(str(tmp_path / "runs"), use_tensorboard=False))
    assert set(seen_states) == {2, 4, 6, 8}
    template = {"variables": init_lora(params, jax.random.key(0), rank=4),
                "step": 0}
    restored = ckpt.restore("bg", "UNet_lora", template)
    assert int(restored["step"]) == 4
    chex.assert_trees_all_close(restored["variables"], seen_states[4],
                                atol=0)
    # the eval curve was logged
    import json as _json
    rows = [_json.loads(l)
            for l in open(tmp_path / "runs" / "metrics.jsonl")]
    assert [r["value"] for r in rows if r["name"] == "eval_loss"] == \
        [1.0, 0.5, 2.0, 3.0]


def _scripted_loop(base, tmp_path, evals, max_iter, save_steps, eval_every):
    """Run train_diffusion_lora with a scripted eval curve; return the
    restored UNet_lora checkpoint's step (None if nothing was saved)."""
    from diffusynth_tpu.train.logging import MetricLogger

    _, params, _, _ = base
    rng = np.random.default_rng(7)

    def it():
        while True:
            yield (rng.standard_normal((2, 8, 8, 4)).astype(np.float32),
                   {"instrument_str": ["a", "b"]})

    def eval_fn(lora, step):
        return evals[step]

    cfg = DiffusionTrainConfig(batch_size=2, max_iter=max_iter,
                               save_steps=save_steps, timesteps=50,
                               model_name="sg")
    ckpt = Checkpointer(str(tmp_path / "models"))
    train_diffusion_lora(
        SMALL_UNET, cfg, it(),
        lambda attrs: rng.standard_normal((2, 16)).astype(np.float32),
        np.zeros(16, np.float32), params,
        rank=4, checkpointer=ckpt, eval_fn=eval_fn, eval_every=eval_every,
        logger=MetricLogger(str(tmp_path / "runs"), use_tensorboard=False))
    template = {"variables": init_lora(params, jax.random.key(0), rank=4),
                "step": 0}
    try:
        return int(ckpt.restore("sg", "UNet_lora", template)["step"])
    except Exception:  # noqa: BLE001 — nothing saved
        return None


def test_save_steps_crossing_never_saves_unevaluated(base, tmp_path):
    """With eval_fn set, a save_steps crossing that is NOT an eval crossing
    must not overwrite the best-gated checkpoint with the current
    unevaluated adapter (advisor finding r3, train/lora.py best-gating
    hole). Here the only improvement is at step 2; the save_steps=5
    crossing at step 5 falls between evals and must not save."""
    step = _scripted_loop(base, tmp_path,
                          evals={2: 0.5, 4: 1.0, 6: 2.0},
                          max_iter=6, save_steps=5, eval_every=2)
    assert step == 2


def test_final_eval_improvement_is_saved(base, tmp_path):
    """max_iter not a multiple of save_steps/eval_every: the forced final
    eval's improvement must be checkpointed, not computed and lost
    (advisor finding r3, train/lora.py final-eval hole)."""
    step = _scripted_loop(base, tmp_path,
                          evals={3: 1.0, 6: 0.8, 7: 0.1},
                          max_iter=7, save_steps=100, eval_every=3)
    assert step == 7


def test_from_pretrained_warns_on_missing_sidecar(base, tmp_path):
    """A missing <name>_UNet_lora.json sidecar silently assumed rank 8 /
    alpha 16 (r2 advisor finding) — the defaulting must be loud, because
    a rank mismatch then surfaces as an opaque orbax shape error."""
    import os
    import warnings

    from diffusynth_tpu.pipelines import DiffuSynthRuntime
    from diffusynth_tpu.text import CachedTextEncoder, HashTextEncoder
    from tests.test_pipelines import tiny_config

    enc = CachedTextEncoder(HashTextEncoder(16))
    rt = DiffuSynthRuntime(tiny_config(), text_encoder=enc, seed=0)
    models_dir = str(tmp_path / "models")
    ckpt = Checkpointer(models_dir)
    ckpt.save("unet", "UNet", {"variables": rt.unet_variables, "step": 1})
    adapter = init_lora(rt.unet_variables, jax.random.key(0), rank=8)
    ckpt.save("ft", "UNet_lora", {"variables": adapter, "step": 1})
    ckpt.save_hyperparameters("ft", "UNet_lora", {"rank": 8, "alpha": 16.0})

    # sidecar present: silent
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        DiffuSynthRuntime.from_pretrained(
            models_dir, config=tiny_config(), lora_name="ft",
            text_encoder=enc)
    # sidecar removed: loud
    os.remove(os.path.join(models_dir, "hyperparameters",
                           "ft_UNet_lora.json"))
    with pytest.warns(UserWarning, match="assuming LoRA rank"):
        DiffuSynthRuntime.from_pretrained(
            models_dir, config=tiny_config(), lora_name="ft",
            text_encoder=enc)
