"""Training subsystem tests: loss decreases for every model, checkpoints
round-trip, DP sharding over the 8-virtual-device CPU mesh."""

import os

import chex
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from diffusynth_tpu.configs import (
    ContrastiveTrainConfig,
    DiffusionTrainConfig,
    GANTrainConfig,
    MultiModalConfig,
    TimbreEncoderConfig,
    TimbreTrainConfig,
    UNetConfig,
    VQGANConfig,
    VQGANTrainConfig,
)
from diffusynth_tpu.metrics import inception_score, spectrogram_mae
from diffusynth_tpu.nn.multimodal import MultiModalModel
from diffusynth_tpu.nn.timbre import TimbreEncoder
from diffusynth_tpu.nn.unet import ConditionedUnet
from diffusynth_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from diffusynth_tpu.train import (
    Checkpointer,
    SyntheticNSynthDataset,
    data_iterator,
    make_contrastive_train_step,
    make_diffusion_train_step,
    make_timbre_train_step,
    train_diffusion_model,
)
from diffusynth_tpu.train.timbre_train import batch_labels

SMALL_UNET = UNetConfig(down_dims=(8, 8, 16, 32), up_dims=(32, 32, 16, 8),
                        label_emb_dim=16)
SMALL_TIMBRE = TimbreEncoderConfig(
    input_dim=32, feature_dim=16, hidden_dim=24, num_instrument_classes=8,
    num_instrument_family_classes=11, num_velocity_classes=128,
    num_qualities=10, num_layers=1,
)


class TestDiffusionTrainStep:
    def test_loss_decreases(self):
        unet = ConditionedUnet(SMALL_UNET)
        rng = np.random.default_rng(0)
        latents = jnp.asarray(rng.standard_normal((4, 8, 8, 4)), jnp.float32)
        cond = jnp.asarray(rng.standard_normal((4, 16)), jnp.float32)
        uncond = jnp.zeros(16)
        params = unet.init(jax.random.key(0), latents,
                           jnp.zeros(4, jnp.int32), cond)
        init_fn, step_fn = make_diffusion_train_step(
            unet, timesteps=50, lr=2e-3)
        opt_state = init_fn(params)
        losses = []
        key = jax.random.key(1)
        for i in range(30):
            key, sub = jax.random.split(key)
            params, opt_state, loss = step_fn(
                params, opt_state, sub, latents, cond, uncond)
            losses.append(float(loss))
        assert np.mean(losses[-5:]) < np.mean(losses[:5])

    def test_multi_step_dispatch_matches_sequential(self):
        """steps_per_dispatch=K (one lax.scan dispatch carrying K optimizer
        steps — amortizes per-call pytree marshaling, RESULTS_r2.md
        config-5) computes EXACTLY K sequential step_fn calls when the
        sequential loop uses the same split subkeys."""
        unet = ConditionedUnet(SMALL_UNET)
        rng = np.random.default_rng(3)
        K = 3
        latents = jnp.asarray(rng.standard_normal((K, 2, 8, 8, 4)),
                              jnp.float32)
        cond = jnp.asarray(rng.standard_normal((K, 2, 16)), jnp.float32)
        uncond = jnp.zeros(16)
        params0 = unet.init(jax.random.key(0), latents[0],
                            jnp.zeros(2, jnp.int32), cond[0])

        # SGD: Adam's m/(sqrt(v)+eps) amplifies float-reassociation noise
        # (scan-compiled vs eager steps) into lr-scale param differences;
        # with a smooth optimizer grads==grads => params==params.
        import optax
        init1, step1 = make_diffusion_train_step(
            unet, timesteps=50, optimizer=optax.sgd(1e-2))
        initk, stepk = make_diffusion_train_step(
            unet, timesteps=50, optimizer=optax.sgd(1e-2),
            steps_per_dispatch=K)
        key = jax.random.key(7)

        p = jax.tree_util.tree_map(jnp.copy, params0)
        s = init1(p)
        seq_losses = []
        for i, sub in enumerate(jax.random.split(key, K)):
            p, s, loss = step1(p, s, sub, latents[i], cond[i], uncond)
            seq_losses.append(float(loss))

        pk = jax.tree_util.tree_map(jnp.copy, params0)
        sk = initk(pk)
        pk, sk, losses = stepk(pk, sk, key, latents, cond, uncond)
        assert losses.shape == (K,)
        np.testing.assert_allclose(np.asarray(losses), seq_losses,
                                   rtol=1e-5, atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(p),
                        jax.tree_util.tree_leaves(pk)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_multi_step_dispatch_loop(self, tmp_path):
        """train_diffusion_model with cfg.steps_per_dispatch > 1 keeps the
        log/checkpoint cadence (boundary-crossing checks) and returns
        finite params."""
        from diffusynth_tpu.train.checkpoints import Checkpointer
        from diffusynth_tpu.train.logging import MetricLogger

        ds = SyntheticNSynthDataset(n=16, shape=(8, 8, 4))

        def cond_lookup(attrs):
            return np.stack([
                np.full(16, a["instrument"] / 8.0, np.float32) for a in attrs
            ])

        it = data_iterator(ds, batch_size=2, seed=0)
        cfg = DiffusionTrainConfig(batch_size=2, max_iter=8, save_steps=4,
                                   timesteps=50, steps_per_dispatch=4,
                                   model_name="t_msd",
                                   compute_dtype="float32")
        ckpt = Checkpointer(str(tmp_path / "models"))
        params, _ = train_diffusion_model(
            SMALL_UNET, cfg, it, cond_lookup, np.zeros(16, np.float32),
            checkpointer=ckpt,
            logger=MetricLogger(str(tmp_path), use_tensorboard=False),
        )
        for leaf in jax.tree_util.tree_leaves(params):
            assert bool(jnp.isfinite(leaf).all())
        # checkpoint cadence crossed save_steps=4 twice within 8 steps
        assert ckpt.exists("t_msd", "UNet")

    def test_compute_dtype_float32_loop(self, tmp_path):
        """compute_dtype="float32" (the reference-numerics opt-out of the
        bf16 default) drives the loop with an f32-compute module; params
        come back float32 and finite. (The bf16 default path is exercised
        by test_loop_with_checkpointing and the VQGAN dtype test.)"""
        from diffusynth_tpu.train.logging import MetricLogger

        ds = SyntheticNSynthDataset(n=16, shape=(8, 8, 4))

        def cond_lookup(attrs):
            return np.stack([
                np.full(16, a["instrument"] / 8.0, np.float32) for a in attrs
            ])

        it = data_iterator(ds, batch_size=4, seed=0)
        cfg = DiffusionTrainConfig(batch_size=4, max_iter=4, save_steps=100,
                                   timesteps=50, compute_dtype="float32",
                                   model_name="t_f32")
        params, _ = train_diffusion_model(
            SMALL_UNET, cfg, it, cond_lookup, np.zeros(16, np.float32),
            logger=MetricLogger(str(tmp_path), use_tensorboard=False),
        )
        for leaf in jax.tree_util.tree_leaves(params):
            assert leaf.dtype == jnp.float32, leaf.dtype
            assert bool(jnp.isfinite(leaf).all())

    def test_weight_ema(self):
        """ema_decay keeps an EMA copy of the weights inside opt_state:
        after one step ema == decay*init + (1-decay)*params (exactly);
        after several steps it trails the live params."""
        from diffusynth_tpu.train.diffusion_train import get_ema_params

        unet = ConditionedUnet(SMALL_UNET)
        rng = np.random.default_rng(1)
        latents = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
        cond = jnp.asarray(rng.standard_normal((2, 16)), jnp.float32)
        uncond = jnp.zeros(16)
        params = unet.init(jax.random.key(0), latents,
                           jnp.zeros(2, jnp.int32), cond)
        init0 = jax.tree_util.tree_map(np.asarray, params)
        decay = 0.5
        init_fn, step_fn = make_diffusion_train_step(
            unet, timesteps=50, lr=2e-3, ema_decay=decay)
        opt_state = init_fn(params)
        params, opt_state, _ = step_fn(
            params, opt_state, jax.random.key(2), latents, cond, uncond)
        ema = get_ema_params(opt_state)
        want = jax.tree_util.tree_map(
            lambda i, p: decay * i + (1 - decay) * np.asarray(p),
            init0, params)
        chex.assert_trees_all_close(
            jax.tree_util.tree_map(np.asarray, ema), want,
            atol=1e-6, rtol=1e-5)
        for i in range(3, 6):
            params, opt_state, _ = step_fn(
                params, opt_state, jax.random.key(i), latents, cond, uncond)
        ema = jax.tree_util.tree_leaves(get_ema_params(opt_state))
        live = jax.tree_util.tree_leaves(params)
        assert any(float(jnp.abs(e - p).max()) > 1e-7
                   for e, p in zip(ema, live))

    def test_ema_off_by_default(self):
        from diffusynth_tpu.train.diffusion_train import get_ema_params

        unet = ConditionedUnet(SMALL_UNET)
        latents = jnp.zeros((2, 8, 8, 4))
        params = unet.init(jax.random.key(0), latents,
                           jnp.zeros(2, jnp.int32), jnp.zeros((2, 16)))
        init_fn, _ = make_diffusion_train_step(unet, timesteps=50)
        with pytest.raises(ValueError, match="no EMA"):
            get_ema_params(init_fn(params))

    def test_loop_with_checkpointing(self, tmp_path):
        ds = SyntheticNSynthDataset(n=32, shape=(8, 8, 4))
        it = data_iterator(ds, batch_size=4, seed=0)

        def cond_lookup(attrs):
            return np.stack([
                np.full(16, a["instrument"] / 8.0, np.float32) for a in attrs
            ])

        from diffusynth_tpu.train.logging import MetricLogger

        ckpt = Checkpointer(str(tmp_path / "models"))
        cfg = DiffusionTrainConfig(batch_size=4, max_iter=6, save_steps=3,
                                   timesteps=50, model_name="tiny")
        params, _ = train_diffusion_model(
            SMALL_UNET, cfg, it, cond_lookup, np.zeros(16, np.float32),
            checkpointer=ckpt,
            logger=MetricLogger(str(tmp_path), use_tensorboard=False),
        )
        assert ckpt.exists("tiny", "UNet")
        restored = ckpt.restore("tiny", "UNet",
                                {"variables": params, "step": 0})
        assert int(restored["step"]) == 6
        chex_leaf = jax.tree_util.tree_leaves(restored["variables"])[0]
        assert np.isfinite(np.asarray(chex_leaf)).all()
        # Hyperparameter sidecar written (reference convention).
        assert os.path.exists(
            str(tmp_path / "models" / "hyperparameters" / "tiny_UNet.json"))
        # No EMA role without ema_decay (the main payload must keep the
        # standard {variables, step} template — see diffusion_train.py).
        assert not ckpt.exists("tiny", "UNet_ema")

    def test_loop_checkpoints_ema_role(self, tmp_path):
        """ema_decay>0 writes a sibling UNet_ema checkpoint whose weights
        differ from the live ones but restore with the SAME standard
        template (from_pretrained(use_ema=True) consumes it)."""
        ds = SyntheticNSynthDataset(n=32, shape=(8, 8, 4))
        it = data_iterator(ds, batch_size=4, seed=0)

        def cond_lookup(attrs):
            return np.stack([
                np.full(16, a["instrument"] / 8.0, np.float32) for a in attrs
            ])

        from diffusynth_tpu.train.logging import MetricLogger

        ckpt = Checkpointer(str(tmp_path / "models"))
        cfg = DiffusionTrainConfig(batch_size=4, max_iter=4, save_steps=4,
                                   timesteps=50, model_name="tiny",
                                   ema_decay=0.9)
        params, _ = train_diffusion_model(
            SMALL_UNET, cfg, it, cond_lookup, np.zeros(16, np.float32),
            checkpointer=ckpt,
            logger=MetricLogger(str(tmp_path), use_tensorboard=False),
        )
        assert ckpt.exists("tiny", "UNet_ema")
        live = ckpt.restore("tiny", "UNet",
                            {"variables": params, "step": 0})
        ema = ckpt.restore("tiny", "UNet_ema",
                           {"variables": params, "step": 0})
        assert int(ema["step"]) == int(live["step"]) == 4
        diffs = [float(np.abs(np.asarray(e) - np.asarray(p)).max())
                 for e, p in zip(jax.tree_util.tree_leaves(ema["variables"]),
                                 jax.tree_util.tree_leaves(live["variables"]))]
        assert max(diffs) > 1e-7


class TestVQGANTrainStep:
    def test_losses_decrease(self):
        from diffusynth_tpu.nn.vqgan import VQGAN, VQGANDiscriminator
        from diffusynth_tpu.train.vqgan_train import make_vqgan_train_step

        mc = VQGANConfig(hidden_channels=(8, 16), attn_pos=(),
                         num_embeddings=16, num_groups=4)
        tc = VQGANTrainConfig(lr=2e-3, d_lr=1e-3)
        vqgan, disc = VQGAN(mc), VQGANDiscriminator()
        rng = np.random.default_rng(0)
        data = jnp.asarray(np.abs(rng.standard_normal((2, 32, 16, 3))),
                           jnp.float32)
        g_vars = vqgan.init(jax.random.key(0), data)
        d_params = disc.init(jax.random.key(1), data)
        init_fn, step_fn = make_vqgan_train_step(vqgan, disc, tc)
        g_opt, d_opt = init_fn(g_vars, d_params)
        first = None
        for i in range(8):
            g_vars, d_params, g_opt, d_opt, metrics = step_fn(
                g_vars, d_params, g_opt, d_opt, data)
            if first is None:
                first = {k: float(v) for k, v in metrics.items()}
        last = {k: float(v) for k, v in metrics.items()}
        assert last["g_loss"] < first["g_loss"]
        assert np.isfinite(last["d_loss"])
        assert last["perplexity"] >= 1.0

    def test_multi_step_dispatch_matches_sequential(self):
        """VQGAN steps_per_dispatch=K == K sequential alternating D/G
        iterations (same data order; the step is PRNG-free)."""
        from diffusynth_tpu.nn.vqgan import VQGAN, VQGANDiscriminator
        from diffusynth_tpu.train.vqgan_train import make_vqgan_train_step

        mc = VQGANConfig(hidden_channels=(8, 16), attn_pos=(),
                         num_embeddings=16, num_groups=4)
        tc = VQGANTrainConfig(lr=2e-3, d_lr=1e-3)
        vqgan, disc = VQGAN(mc), VQGANDiscriminator()
        rng = np.random.default_rng(5)
        K = 2
        data = jnp.asarray(np.abs(rng.standard_normal((K, 2, 32, 16, 3))),
                           jnp.float32)
        g0 = vqgan.init(jax.random.key(0), data[0])
        d0 = disc.init(jax.random.key(1), data[0])

        import optax
        sgd = dict(g_optimizer=optax.sgd(1e-2), d_optimizer=optax.sgd(1e-2))
        init1, step1 = make_vqgan_train_step(vqgan, disc, tc, **sgd)
        gv = jax.tree_util.tree_map(jnp.copy, g0)
        dp = jax.tree_util.tree_map(jnp.copy, d0)
        gs, ds = init1(gv, dp)
        seq = []
        for i in range(K):
            gv, dp, gs, ds, m = step1(gv, dp, gs, ds, data[i])
            seq.append({k: float(v) for k, v in m.items()})

        initk, stepk = make_vqgan_train_step(vqgan, disc, tc,
                                             steps_per_dispatch=K, **sgd)
        gvk = jax.tree_util.tree_map(jnp.copy, g0)
        dpk = jax.tree_util.tree_map(jnp.copy, d0)
        gsk, dsk = initk(gvk, dpk)
        gvk, dpk, gsk, dsk, mk = stepk(gvk, dpk, gsk, dsk, data)
        for k in mk:
            np.testing.assert_allclose(
                np.asarray(mk[k]), [s[k] for s in seq], rtol=1e-5, atol=1e-6)
        # Params: scan-compiled vs eager steps reassociate f32 math through
        # a deep net; the per-step metric equality above already pins the
        # semantics (step-2 metrics depend on step-1 params). Allow fp noise.
        for a, b in zip(jax.tree_util.tree_leaves(gv),
                        jax.tree_util.tree_leaves(gvk)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=5e-4)

    def test_compute_dtype_bf16_keeps_f32_params(self, tmp_path):
        """train_vqgan with the default bfloat16 compute dtype: params and
        opt state stay float32 (mixed precision — only the forward/backward
        compute casts), metrics stay finite."""
        from diffusynth_tpu.train.vqgan_train import train_vqgan

        mc = VQGANConfig(hidden_channels=(8, 16), attn_pos=(),
                         num_embeddings=16, num_groups=4)
        ds = SyntheticNSynthDataset(n=8, shape=(32, 16, 3))
        it = data_iterator(ds, batch_size=2, seed=0)
        from diffusynth_tpu.train.logging import MetricLogger

        cfg = VQGANTrainConfig(max_iter=2, save_steps=10,
                               compute_dtype="bfloat16")
        assert cfg.compute_dtype == "bfloat16"  # the TPU-native default
        g_vars, d_params = train_vqgan(
            mc, cfg, it,
            logger=MetricLogger(str(tmp_path), use_tensorboard=False))
        for leaf in jax.tree_util.tree_leaves(g_vars["params"]):
            assert leaf.dtype == jnp.float32, leaf.dtype
        for leaf in jax.tree_util.tree_leaves(d_params):
            assert leaf.dtype == jnp.float32, leaf.dtype

    def test_ema_state_changes(self):
        from diffusynth_tpu.nn.vqgan import VQGAN, VQGANDiscriminator
        from diffusynth_tpu.train.vqgan_train import make_vqgan_train_step

        mc = VQGANConfig(hidden_channels=(8, 16), attn_pos=(),
                         num_embeddings=16, num_groups=4)
        vqgan, disc = VQGAN(mc), VQGANDiscriminator()
        data = jnp.asarray(
            np.abs(np.random.default_rng(0).standard_normal((2, 32, 16, 3))),
            jnp.float32)
        g_vars = vqgan.init(jax.random.key(0), data)
        d_params = disc.init(jax.random.key(1), data)
        init_fn, step_fn = make_vqgan_train_step(
            vqgan, disc, VQGANTrainConfig())
        g_opt, d_opt = init_fn(g_vars, d_params)
        before = np.asarray(g_vars["vq"]["_vq_vae"]["_embedding"])
        g_vars2, *_ = step_fn(g_vars, d_params, g_opt, d_opt, data)
        after = np.asarray(g_vars2["vq"]["_vq_vae"]["_embedding"])
        assert not np.allclose(before, after)


class TestMultiStepLoops:
    def test_timbre_contrastive_gan_loops_at_k2(self, tmp_path):
        """The three remaining train loops run at steps_per_dispatch=2
        (stacked batches, (K,)-vector metrics, boundary-crossing cadence)
        and return finite params."""
        from diffusynth_tpu.configs import (
            ContrastiveTrainConfig,
            GANTrainConfig,
            MultiModalConfig,
            TimbreTrainConfig,
        )
        from diffusynth_tpu.train.contrastive_train import train_multimodal
        from diffusynth_tpu.train.gan_train import train_gan
        from diffusynth_tpu.train.logging import MetricLogger
        from diffusynth_tpu.train.timbre_train import train_timbre_encoder

        ds = SyntheticNSynthDataset(n=16, shape=(8, 8, 4), n_instruments=8)
        logger = lambda: MetricLogger(str(tmp_path), use_tensorboard=False)  # noqa: E731

        tc = TimbreTrainConfig(max_iter=4, save_steps=2,
                               steps_per_dispatch=2, model_name="t_tk2")
        params, _ = train_timbre_encoder(
            SMALL_TIMBRE, tc, data_iterator(ds, 2, seed=0), logger=logger())
        assert all(bool(jnp.isfinite(leaf).all())
                   for leaf in jax.tree_util.tree_leaves(params))

        mcfg = MultiModalConfig(text_feature_dim=8,
                                spectrogram_feature_dim=16,
                                multi_modal_emb_dim=8, dropout=0.0)
        cc = ContrastiveTrainConfig(max_iter=4, save_steps=2,
                                    steps_per_dispatch=2, model_name="t_ck2")
        rng = np.random.default_rng(0)
        lookup = lambda ats: rng.standard_normal(  # noqa: E731
            (len(ats), 8)).astype(np.float32)
        params, _ = train_multimodal(
            mcfg, SMALL_TIMBRE, cc, data_iterator(ds, 2, seed=1), lookup,
            logger=logger())
        assert all(bool(jnp.isfinite(leaf).all())
                   for leaf in jax.tree_util.tree_leaves(params))

        gc = GANTrainConfig(max_iter=4, save_steps=2, steps_per_dispatch=2,
                            model_name="t_gk2", compute_dtype="float32")
        glookup = lambda ats: rng.standard_normal(  # noqa: E731
            (len(ats), 16)).astype(np.float32)
        g, d = train_gan(SMALL_UNET, gc, data_iterator(ds, 2, seed=2),
                         glookup, logger=logger())
        assert all(bool(jnp.isfinite(leaf).all())
                   for leaf in jax.tree_util.tree_leaves(g))


class TestTimbreTrainStep:
    def test_accuracy_improves(self):
        model = TimbreEncoder(SMALL_TIMBRE)
        ds = SyntheticNSynthDataset(n=16, shape=(8, 8, 4), n_instruments=4)
        data, attrs = ds.get_batch(np.arange(16))
        latents = jnp.asarray(data)
        inst, fam, vel, qual = batch_labels(attrs)
        params = model.init(jax.random.key(0), latents)
        init_fn, step_fn = make_timbre_train_step(model, lr=5e-3)
        opt_state = init_fn(params)
        accs = []
        for _ in range(40):
            params, opt_state, loss, metrics = step_fn(
                params, opt_state, latents, jnp.asarray(inst),
                jnp.asarray(fam), jnp.asarray(vel), jnp.asarray(qual))
            accs.append(float(metrics["instrument_acc"]))
        assert accs[-1] > accs[0]


class TestContrastiveTrainStep:
    def test_loss_decreases(self):
        mcfg = MultiModalConfig(text_feature_dim=12,
                                spectrogram_feature_dim=24,
                                multi_modal_emb_dim=16, dropout=0.0)
        model = MultiModalModel(mcfg, SMALL_TIMBRE)
        rng = np.random.default_rng(0)
        latents = jnp.asarray(rng.standard_normal((4, 8, 8, 4)), jnp.float32)
        text = jnp.asarray(rng.standard_normal((4, 12)), jnp.float32)
        params = model.init(jax.random.key(0), latents, text)
        init_fn, step_fn = make_contrastive_train_step(
            model, ContrastiveTrainConfig(head_lr=3e-3))
        opt_state = init_fn(params)
        losses = []
        key = jax.random.key(1)
        for _ in range(25):
            key, sub = jax.random.split(key)
            params, opt_state, loss = step_fn(params, opt_state, sub,
                                              latents, text)
            losses.append(float(loss))
        assert losses[-1] < losses[0]


class TestGANTrainStep:
    def test_runs_and_finite(self):
        from diffusynth_tpu.nn.gan import GANDiscriminator
        from diffusynth_tpu.train.gan_train import make_gan_train_steps

        gen = ConditionedUnet(SMALL_UNET)
        disc = GANDiscriminator(label_emb_dim=16)
        rng = np.random.default_rng(0)
        real = jnp.asarray(rng.standard_normal((2, 16, 16, 4)), jnp.float32)
        cond = jnp.asarray(rng.standard_normal((2, 16)), jnp.float32)
        g_params = gen.init(jax.random.key(0), real,
                            jnp.zeros(2, jnp.int32), cond)
        d_params = disc.init(jax.random.key(1), real, cond)
        init_fn, step_fn = make_gan_train_steps(gen, disc, GANTrainConfig())
        g_opt, d_opt = init_fn(g_params, d_params)
        for i in range(3):
            g_params, d_params, g_opt, d_opt, metrics = step_fn(
                g_params, d_params, g_opt, d_opt, jax.random.key(i), real,
                cond)
        assert np.isfinite(float(metrics["g_loss"]))
        assert np.isfinite(float(metrics["d_loss"]))


class TestDataPipeline:
    def test_synthetic_dataset_contract(self):
        ds = SyntheticNSynthDataset(n=10, shape=(8, 8, 3))
        data, attrs = ds.get_batch(np.array([0, 3, 7]))
        assert data.shape == (3, 8, 8, 3)
        for a in attrs:
            assert set(a) == {"instrument", "instrument_family", "velocity",
                              "qualities", "instrument_source_str",
                              "instrument_family_str"}
            assert len(a["qualities"]) == 10

    def test_iterator_shuffles(self):
        ds = SyntheticNSynthDataset(n=64, shape=(4, 4, 3))
        it = data_iterator(ds, batch_size=8, seed=1)
        b1, _ = next(it)
        b2, _ = next(it)
        assert not np.allclose(b1, b2)

    def test_determinism_per_index(self):
        ds = SyntheticNSynthDataset(n=8, shape=(4, 4, 3))
        a, _ = ds.get_batch(np.array([2]))
        b, _ = ds.get_batch(np.array([2]))
        np.testing.assert_allclose(a, b)

    def test_caption_mapping_lookup(self, tmp_path):
        """--captions semantics: random variant per sample, flat single
        embeddings accepted, missing keys fall back to the hash stand-in
        (reference: model/diffusion.py:471-476)."""
        import json

        from diffusynth_tpu.dsp.utils import create_key
        from diffusynth_tpu.train.run import _mapping_lookup

        dim = 8

        def attr(src, fam, bits):
            return {"instrument_source_str": src,
                    "instrument_family_str": fam, "qualities": bits}

        attrs = [attr("acoustic", "organ", [0, 1]),
                 attr("electronic", "string", [1, 0]),
                 attr("synthetic", "brass", [1, 1])]
        k0, k1 = create_key(attrs[0]), create_key(attrs[1])
        mapping = {
            k0: [[1.0] * dim, [2.0] * dim],   # two caption variants
            k1: [3.0] * dim,                  # flat single embedding
        }                                      # attrs[2]'s key: missing
        path = tmp_path / "map.json"
        path.write_text(json.dumps(mapping))

        lookup = _mapping_lookup(str(path), dim, seed=0)
        out = lookup(attrs)
        assert out.shape == (3, dim) and out.dtype == np.float32
        assert out[0, 0] in (1.0, 2.0) and (out[0] == out[0, 0]).all()
        np.testing.assert_allclose(out[1], 3.0)
        assert np.abs(out[2]).max() > 0  # hash fallback, not zeros
        # Variant choice varies across repeated lookups (random.choice
        # per step in the reference).
        draws = {float(lookup(attrs)[0, 0]) for _ in range(16)}
        assert draws == {1.0, 2.0}


class TestMetrics:
    def test_inception_score_bounds(self):
        # Uniform posterior -> IS == 1; one-hot spread -> IS == K.
        n, k = 64, 8
        uniform = np.log(np.full((n, k), 1.0 / k))
        assert abs(inception_score(uniform) - 1.0) < 1e-6
        onehot = np.full((n, k), 1e-12)
        for i in range(n):
            onehot[i, i % k] = 1.0
        assert inception_score(np.log(onehot)) > k * 0.9

    def test_spectrogram_mae(self):
        a = np.zeros((2, 4, 4, 3))
        b = np.full((2, 4, 4, 3), 0.5)
        assert spectrogram_mae(a, b) == pytest.approx(0.5)


class TestDataParallel:
    """DP over the 8-virtual-device CPU mesh: real collectives."""

    def test_mesh_and_sharding(self):
        assert jax.device_count() == 8
        mesh = make_mesh(8)
        x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
        xs = shard_batch(x, mesh)
        assert xs.sharding.num_devices == 8
        np.testing.assert_allclose(np.asarray(xs), x)

    def test_diffusion_train_step_sharded_matches_single(self):
        unet = ConditionedUnet(SMALL_UNET)
        rng = np.random.default_rng(0)
        latents = rng.standard_normal((8, 8, 8, 4)).astype(np.float32)
        cond = rng.standard_normal((8, 16)).astype(np.float32)
        uncond = jnp.zeros(16)
        def fresh_params():
            # deterministic re-init; the step donates (deletes) its inputs
            return unet.init(jax.random.key(0), jnp.asarray(latents),
                             jnp.zeros(8, jnp.int32), jnp.asarray(cond))

        init_fn, step_fn = make_diffusion_train_step(unet, timesteps=50,
                                                     lr=1e-3,
                                                     uncondition_rate=0.0)

        # Single-device run.
        params = fresh_params()
        opt_state = init_fn(params)
        p1, _, loss1 = step_fn(params, opt_state, jax.random.key(9),
                               jnp.asarray(latents), jnp.asarray(cond), uncond)

        # Sharded run: same math, batch split over 8 devices.
        mesh = make_mesh(8)
        params2 = fresh_params()
        params_r = replicate(params2, mesh)
        opt_state_r = replicate(init_fn(params2), mesh)
        lat_s = shard_batch(latents, mesh)
        cond_s = shard_batch(cond, mesh)
        p2, _, loss2 = step_fn(params_r, opt_state_r, jax.random.key(9),
                               lat_s, cond_s, replicate(uncond, mesh))
        np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
        l1 = jax.tree_util.tree_leaves(p1)[0]
        l2 = jax.tree_util.tree_leaves(p2)[0]
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


class TestReferenceHDF5Schema:
    """The reference's nsynth-STFT-*-52.hdf5 contract end to end: a tiny
    file in exactly that schema (train/data.py::NSynthDataset docstring;
    reconstructed from colab_notebooks/train-VQGAN.ipynb cell 3/7,
    train_diffusion.ipynb cell 3, train_timbre_encoder.ipynb cell 3) is
    read by get_nsynth_dataloader with every notebook flag combination and
    round-trips through the training CLI — so a user's real NSynth file
    works day one."""

    N, F, T, LH, LW, C = 12, 64, 32, 16, 8, 4

    def _write_fixture(self, path, with_latents=False, with_timbre_emb=False):
        import h5py

        rng = np.random.default_rng(0)
        with h5py.File(path, "w") as h5:
            # channels-first (N, 3, F, T), as a torch-side writer stores it
            h5.create_dataset("STFT", data=rng.standard_normal(
                (self.N, 3, self.F, self.T)).astype(np.float32))
            if with_latents:
                h5.create_dataset("latent_representation",
                                  data=rng.standard_normal(
                                      (self.N, self.LH, self.LW, self.C)
                                  ).astype(np.float32))
            h5.create_dataset("instrument",
                              data=np.arange(self.N, dtype=np.int64))
            h5.create_dataset("instrument_family",
                              data=(np.arange(self.N) % 11).astype(np.int64))
            h5.create_dataset("instrument_source",
                              data=(np.arange(self.N) % 3).astype(np.int64))
            h5.create_dataset("velocity", data=np.full(self.N, 100, np.int64))
            h5.create_dataset("pitch", data=np.full(self.N, 52, np.int64))
            h5.create_dataset("qualities", data=(
                rng.integers(0, 2, (self.N, 10))).astype(np.int8))
            from diffusynth_tpu.train.data import (INSTRUMENT_FAMILIES,
                                                   INSTRUMENT_SOURCES)
            h5.create_dataset("instrument_source_str", data=np.asarray(
                [INSTRUMENT_SOURCES[i % 3].encode() for i in range(self.N)]))
            h5.create_dataset("instrument_family_str", data=np.asarray(
                [INSTRUMENT_FAMILIES[i % 11].encode() for i in range(self.N)]))
            if with_timbre_emb:
                h5.create_dataset("timbre_emb", data=rng.standard_normal(
                    (self.N, 32)).astype(np.float32))
        return str(path)

    def test_stft_loader_with_meta(self, tmp_path):
        """train_diffusion.ipynb cell 3 flags: (data, attributes) batches,
        NHWC conversion, create_key built from the file's own strings."""
        from diffusynth_tpu.dsp.utils import create_key
        from diffusynth_tpu.train import get_nsynth_dataloader

        path = self._write_fixture(tmp_path / "nsynth-STFT-train-52.hdf5")
        loader = get_nsynth_dataloader(path, batch_size=4, shuffle=True,
                                       get_latent_representation=False,
                                       with_meta_data=True, task="STFT")
        assert len(loader) == 3
        data, attributes = next(iter(loader))
        assert data.shape == (4, self.F, self.T, 3)     # NHWC from NCHW
        assert data.dtype == np.float32
        for a in attributes:
            key = create_key(a)
            src, fam = a["instrument_source_str"], a["instrument_family_str"]
            assert key.startswith(f"{src}_{fam}_")
            assert len(key.rsplit("_", 1)[-1]) == 10    # qualities bits
            assert a["pitch"] == 52
        # next(iter(loader)) twice must NOT replay the same epoch head
        # deterministically forever (torch DataLoader reshuffle semantics).
        draws = {next(iter(loader))[0].tobytes() for _ in range(6)}
        assert len(draws) > 1

    def test_vqgan_loader_plain_data(self, tmp_path):
        """train-VQGAN.ipynb cell 3: with_meta_data=False yields bare
        arrays (`data = next(iter(iterator))`, VQGAN.py:675)."""
        from diffusynth_tpu.train import get_nsynth_dataloader

        path = self._write_fixture(tmp_path / "f.hdf5")
        loader = get_nsynth_dataloader(path, batch_size=4, shuffle=True,
                                       get_latent_representation=False,
                                       with_meta_data=False, task="STFT")
        data = next(iter(loader))
        assert isinstance(data, np.ndarray)
        assert data.shape == (4, self.F, self.T, 3)

    def test_latent_and_timbre_emb_loader(self, tmp_path):
        """train_timbre_encoder.ipynb cell 3: latent_representation
        selection + the with_timbre_emb triple."""
        from diffusynth_tpu.train import get_nsynth_dataloader

        path = self._write_fixture(tmp_path / "f.hdf5", with_latents=True,
                                   with_timbre_emb=True)
        loader = get_nsynth_dataloader(path, batch_size=3, shuffle=False,
                                       get_latent_representation=True,
                                       with_meta_data=True,
                                       with_timbre_emb=True, task="STFT")
        data, attributes, emb = next(iter(loader))
        assert data.shape == (3, self.LH, self.LW, self.C)
        assert emb.shape == (3, 32)
        assert len(attributes) == 3

    def test_create_latent_representation_roundtrip(self, tmp_path):
        """train-VQGAN.ipynb cell 7: NSynthDataset.create_latent_representation
        (VAE, quantize=...) writes latent_representation /
        quantized_latent_representation datasets the loader kwargs then
        select (validating loader: get_quantized_latent_representation)."""
        from diffusynth_tpu.nn.vqgan import VQGAN
        from diffusynth_tpu.train import NSynthDataset, get_nsynth_dataloader

        path = self._write_fixture(tmp_path / "f.hdf5")
        vqgan = VQGAN(VQGANConfig(in_channels=3, hidden_channels=(4, 8),
                                  attn_pos=(), embedding_dim=self.C,
                                  num_embeddings=16, num_groups=2))
        variables = vqgan.init(jax.random.key(0),
                               jnp.zeros((1, self.F, self.T, 3)))

        class RT:  # the slice of DiffuSynthRuntime the method needs
            pass

        rt = RT()
        rt.vqgan, rt.vqgan_variables = vqgan, variables

        ds = NSynthDataset(path, task="STFT")
        shape_z = ds.create_latent_representation(rt, quantize=False,
                                                  batch_size=5)
        shape_q = ds.create_latent_representation(rt, quantize=True,
                                                  batch_size=5)
        assert shape_z == shape_q == (self.N, self.F // 4, self.T // 4,
                                      self.C)
        z = next(iter(get_nsynth_dataloader(
            path, batch_size=2, get_latent_representation=True)))
        q = next(iter(get_nsynth_dataloader(
            path, batch_size=2, get_quantized_latent_representation=True)))
        assert z.shape == q.shape == (2, self.F // 4, self.T // 4, self.C)
        assert not np.allclose(z, q)   # quantization must have acted

    def test_latent_dataset_survives_write_back(self, tmp_path):
        """A task="latent" dataset must KEEP yielding latents after
        create_latent_representation's file-handle cycle — not silently
        switch to spectrograms (advisor finding r3, train/data.py)."""
        from diffusynth_tpu.nn.vqgan import VQGAN
        from diffusynth_tpu.train import NSynthDataset

        path = self._write_fixture(tmp_path / "f.hdf5", with_latents=True)
        vqgan = VQGAN(VQGANConfig(in_channels=3, hidden_channels=(4, 8),
                                  attn_pos=(), embedding_dim=self.C,
                                  num_embeddings=16, num_groups=2))
        variables = vqgan.init(jax.random.key(0),
                               jnp.zeros((1, self.F, self.T, 3)))

        class RT:
            pass

        rt = RT()
        rt.vqgan, rt.vqgan_variables = vqgan, variables

        ds = NSynthDataset(path, task="latent")
        before, _ = ds.get_batch(np.arange(2))
        assert before.shape == (2, self.LH, self.LW, self.C)
        ds.create_latent_representation(rt, quantize=True, batch_size=5)
        after, _ = ds.get_batch(np.arange(2))
        assert after.shape == (2, self.LH, self.LW, self.C), (
            "dataset re-bound to the wrong HDF5 key after write-back")

    def test_training_cli_roundtrip(self, tmp_path):
        """The full day-one path: reference-schema file -> train.run CLI
        (--tiny diffusion on latent_representation) -> checkpoint."""
        from diffusynth_tpu.train import Checkpointer
        from diffusynth_tpu.train.run import main

        path = self._write_fixture(tmp_path / "nsynth.hdf5",
                                   with_latents=True)
        main(["--model", "diffusion", "--data", path, "--latents",
              "--tiny", "--max-iter", "3", "--batch-size", "2",
              "--save-steps", "2",
              "--models-dir", str(tmp_path / "models"),
              "--runs-dir", str(tmp_path / "runs")])
        ckpt = Checkpointer(str(tmp_path / "models"))
        assert ckpt.exists("unet", "UNet")


class TestResume:
    """Deterministic kill/resume (VERDICT r4 task 4): a run restored from
    the UNet/UNet_opt roles with the iterator fast-forwarded continues
    BIT-IDENTICALLY to a never-interrupted control. (The production-scale
    TPU artifact is benchmarks/RESULTS_r5.md section 2; this is the tiny
    CPU pin of the mechanics.)"""

    def _run(self, tmp_path, name, max_iter, resume=False):
        from diffusynth_tpu.train.run import main

        main(["--model", "diffusion", "--synthetic", "--tiny",
              "--class-signal", "template", "--max-iter", str(max_iter),
              "--save-steps", "4", "--batch-size", "2",
              "--models-dir", str(tmp_path / "models"), "--name", name,
              "--runs-dir", str(tmp_path / "runs"),
              "--ema-decay", "0.9"] + (["--resume"] if resume else []))

    def test_resume_bit_identical(self, tmp_path):
        from diffusynth_tpu.configs import (DiffusionTrainConfig,
                                            tiny_app_config)
        from diffusynth_tpu.train.diffusion_train import (
            restore_diffusion_state,
        )

        app = tiny_app_config()
        a = app.audio
        shape = (a.latent_height, a.vae_scale * 16, a.channels)
        # control: 8 steps straight; victim: 4 steps, "crash", resume to 8
        self._run(tmp_path, "ctl", 8)
        self._run(tmp_path, "res", 4)
        self._run(tmp_path, "res", 8, resume=True)

        ck = Checkpointer(str(tmp_path / "models"))
        cfg = DiffusionTrainConfig(model_name="ctl", ema_decay=0.9,
                                   batch_size=2, save_steps=4)
        sA = restore_diffusion_state(app.unet, cfg, ck, shape)
        sB = restore_diffusion_state(
            app.unet, cfg.replace(model_name="res"), ck, shape)
        assert sA[2] == sB[2] == 8
        for x, y in zip(jax.tree_util.tree_leaves(sA[0]),
                        jax.tree_util.tree_leaves(sB[0])):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree_util.tree_leaves(sA[1]),
                        jax.tree_util.tree_leaves(sB[1])):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_restore_none_when_roles_missing(self, tmp_path):
        from diffusynth_tpu.configs import (DiffusionTrainConfig,
                                            tiny_app_config)
        from diffusynth_tpu.train.diffusion_train import (
            restore_diffusion_state,
        )

        app = tiny_app_config()
        a = app.audio
        ck = Checkpointer(str(tmp_path / "models"))
        cfg = DiffusionTrainConfig(model_name="nope")
        assert restore_diffusion_state(
            app.unet, cfg, ck,
            (a.latent_height, 8, a.channels)) is None

    def test_data_iterator_skip_replays(self):
        from diffusynth_tpu.train.data import data_iterator

        ds = SyntheticNSynthDataset(n=16, shape=(4, 4, 3))
        full = data_iterator(ds, batch_size=2, seed=7)
        for _ in range(5):
            next(full)
        skipped = data_iterator(ds, batch_size=2, seed=7, skip=5)
        for _ in range(3):
            a, _ = next(full)
            b, _ = next(skipped)
            np.testing.assert_array_equal(a, b)

    def test_crash_safe_overwrite_keeps_old_on_failure(self, tmp_path,
                                                       monkeypatch):
        """If writing the replacement checkpoint fails, the previous one
        must survive (the old rmtree-first ordering destroyed it —
        RESULTS_r5.md section 2 bug 1)."""
        ck = Checkpointer(str(tmp_path / "m"))
        state = {"variables": {"w": np.ones(3, np.float32)}, "step": 1}
        ck.save("x", "UNet", state)

        def boom(path, st):
            raise RuntimeError("disk full")

        monkeypatch.setattr(ck._ckpt, "save", boom)
        try:
            ck.save("x", "UNet", {"variables": {"w": np.zeros(3)},
                                  "step": 2})
        except RuntimeError:
            pass
        restored = ck.restore("x", "UNet", state)
        assert int(restored["step"]) == 1
        np.testing.assert_array_equal(np.asarray(restored["variables"]["w"]),
                                      np.ones(3, np.float32))
