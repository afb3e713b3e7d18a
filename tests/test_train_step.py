"""End-to-end tests of the fused train step, single- and multi-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from td_vc_gan_tpu import config as cfg_mod
from td_vc_gan_tpu import parallel
from td_vc_gan_tpu.models import CollaborativeMultibandDiscriminator, LatentClassifier
from td_vc_gan_tpu.models import crepe as crepe_mod
from td_vc_gan_tpu.models.generator import Generator
from td_vc_gan_tpu.training import state as state_mod
from td_vc_gan_tpu.training import step as step_mod

SEG = 1280  # small ×320 multiple => 21 crepe frames
NUM_SPK = 4


def tiny_cfg(**train_overrides):
    cfg = cfg_mod.Config()
    cfg.model.generator.decoder_ratios = [10, 4, 2, 2]  # must end [2,2]: taps vs D cascade
    cfg.model.generator.decoder_channels = [16, 16, 8, 8, 4]
    cfg.model.generator.content_dim = 8
    cfg.model.generator.conditional_dim = 8
    cfg.model.generator.mrf_kernel_sizes = [3]
    cfg.model.generator.mrf_dilations = [1, 3]
    cfg.model.discriminator.num_channels_base = 4
    cfg.train.max_segment = SEG
    cfg.train.batch_size = 4
    cfg.train.mel_fft_sizes = [512]
    for k, v in train_overrides.items():
        setattr(cfg.train, k, v)
    return cfg


def build_all(cfg, with_c=True):
    gc = cfg.model.generator
    G = Generator(
        decoder_ratios=tuple(gc.decoder_ratios),
        decoder_channels=tuple(gc.decoder_channels),
        num_bottleneck_layers=0,
        num_classes=NUM_SPK,
        conditional_dim=gc.conditional_dim,
        content_dim=gc.content_dim,
        kernel_sizes=tuple(gc.mrf_kernel_sizes),
        dilations=tuple(gc.mrf_dilations),
    )
    dc = cfg.model.discriminator
    D = CollaborativeMultibandDiscriminator(
        num_disc=dc.num_disc, num_classes=NUM_SPK, num_layers=dc.num_layers,
        num_channels_base=dc.num_channels_base,
    )
    C = LatentClassifier(num_classes=NUM_SPK) if with_c else None

    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, SEG, 1))
    onehot = jax.nn.one_hot(jnp.array([0]), NUM_SPK)
    pg = G.init(key, x, onehot, None, jnp.zeros((1, SEG, 1)))
    subs = D.get_subsamples(x, dc.num_disc)
    pd = D.init(key, x, jnp.array([0]), subs)
    pc = C.init(key, jnp.zeros((1, SEG // 320, gc.content_dim))) if with_c else None
    cp = crepe_mod.init_crepe(key)
    st, opts = state_mod.create_train_state(cfg, pg, pd, pc, cp)
    return G, D, C, st, opts


def fake_batch(rng, b=4):
    t = np.arange(SEG) / 16000
    sigs = []
    for i in range(b):
        f = 120 + 40 * i
        sigs.append(0.2 * np.sin(2 * np.pi * f * t) + 0.01 * rng.standard_normal(SEG))
    return {
        "signal": jnp.asarray(np.stack(sigs).astype(np.float32)),
        "corrupted": jnp.asarray(np.stack(sigs).astype(np.float32)),
        "label": jnp.asarray(np.arange(b) % NUM_SPK, dtype=jnp.int32),
    }


class TestTrainStepStage1:
    """conv_enc-stage1-style: no_conv=False, rec off, idt on, f0 on."""

    @pytest.fixture(scope="class")
    def setup(self):
        cfg = tiny_cfg(lambda_rec=0.0, lambda_idt=5.0, lambda_f0=10.0,
                       lambda_cont_emb=1.0, lambda_latcls=1.0)
        G, D, C, st, opts = build_all(cfg)
        ts = jax.jit(step_mod.build_train_step(cfg, G, D, C, opts))
        return cfg, G, D, C, st, ts

    def test_step_runs_and_updates(self, setup, rng):
        cfg, G, D, C, st, ts = setup
        batch = fake_batch(rng)
        st2, metrics = ts(st, batch, jax.random.PRNGKey(42))
        assert int(st2.step) == 1
        for k, v in metrics.items():
            assert np.isfinite(np.asarray(v)).all(), f"{k} not finite"
        # every sub-model's params moved
        for name, old, new in [
            ("G", st.params_g, st2.params_g),
            ("D", st.params_d, st2.params_d),
            ("C", st.params_c, st2.params_c),
        ]:
            diffs = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a - b)).max()), old, new)
            assert max(jax.tree.leaves(diffs)) > 0, f"{name} params did not change"
        # frozen CREPE untouched
        same = jax.tree.map(lambda a, b: bool((np.asarray(a) == np.asarray(b)).all()),
                            st.crepe_params, st2.crepe_params)
        assert all(jax.tree.leaves(same))

    def test_expected_metric_keys(self, setup, rng):
        cfg, G, D, C, st, ts = setup
        _, metrics = ts(st, fake_batch(rng), jax.random.PRNGKey(0))
        for key in ["D_loss", "D_loss_adv_real", "D_loss_adv_fake",
                    "G_loss", "G_loss_adv_fake", "G_loss_idt",
                    "G_loss_cont_emb", "G_loss_lat_cls", "g_loss_f0",
                    "C_loss", "C_acc"]:
            assert key in metrics, key

    def test_losses_decrease_over_steps(self, setup, rng):
        cfg, G, D, C, st, ts = setup
        batch = fake_batch(rng)
        first = last = None
        for i in range(4):
            st, metrics = ts(st, batch, jax.random.PRNGKey(i))
            if first is None:
                first = float(metrics["G_loss_idt"])
            last = float(metrics["G_loss_idt"])
        assert np.isfinite(last)
        assert last < first * 1.5  # not diverging on a fixed batch


class TestTrainStepStage2_2:
    def test_cycle_path(self, rng):
        cfg = tiny_cfg(no_conv=False, lambda_rec=2.0, lambda_idt=1.0,
                       lambda_f0=10.0, lambda_cont_emb=1.0)
        G, D, C, st, opts = build_all(cfg)
        ts = jax.jit(step_mod.build_train_step(cfg, G, D, C, opts))
        st2, metrics = ts(st, fake_batch(rng), jax.random.PRNGKey(1))
        assert "G_loss_rec_spec" in metrics and "G_loss_rec_feat" in metrics
        assert np.isfinite(float(metrics["G_loss"]))

    def test_no_conv_with_interval_gating(self, rng):
        # one compile covers both: no_conv reconstruction semantics AND the
        # D_step_interval lax.cond gating path (train.py:259)
        cfg = tiny_cfg(no_conv=True, lambda_rec=0.0, lambda_idt=20.0,
                       lambda_f0=0.0, lambda_cont_emb=0.0, D_step_interval=2)
        G, D, C, st, opts = build_all(cfg)
        ts = jax.jit(step_mod.build_train_step(cfg, G, D, C, opts))
        batch = fake_batch(rng)
        st1, m1 = ts(st, batch, jax.random.PRNGKey(0))   # step 0: D updates
        assert float(m1["G_loss_idt"]) > 0
        assert np.isfinite(float(m1["G_loss"]))
        st2, m2 = ts(st1, batch, jax.random.PRNGKey(1))  # step 1: D skipped
        d_same = jax.tree.map(lambda a, b: bool((np.asarray(a) == np.asarray(b)).all()),
                              st1.params_d, st2.params_d)
        assert all(jax.tree.leaves(d_same))
        assert float(m2["D_loss"]) == 0.0  # gated metrics zeroed


class TestSharedEncoderPairForward:
    """The conversion+identity pair forward encodes the source ONCE and
    decodes both passes from the same f32 content (TDVC_SHARED_ENC=1,
    default). Same math as the split 2B-encode form; only conv roundoff may
    differ (XLA tiles the encoder convs differently at batch B vs 2B), so
    the step metrics must agree to f32-ULP-level tolerance while the
    same-shape decode-from-content path (next test) is exactly equal."""

    def test_matches_split_encode(self, rng, monkeypatch):
        cfg = tiny_cfg(no_conv=False, lambda_rec=2.0, lambda_idt=1.0,
                       lambda_f0=1.0, lambda_cont_emb=1.0,
                       lambda_corrupted=1.0, lambda_converted=1.0)
        G, D, C, st, opts = build_all(cfg)
        batch = fake_batch(rng)
        key = jax.random.PRNGKey(7)
        out = {}
        for flag in ("1", "0"):
            monkeypatch.setenv("TDVC_SHARED_ENC", flag)
            step = jax.jit(step_mod.build_train_step(cfg, G, D, C, opts))
            st1, m1 = step(st, batch, key)
            _, m2 = step(st1, batch, jax.random.PRNGKey(8))  # updated-state chain
            out[flag] = {**{k: float(v) for k, v in m1.items()},
                         "step2_G_loss": float(m2["G_loss"])}
        for k in out["1"]:
            np.testing.assert_allclose(
                out["1"][k], out["0"][k], rtol=1e-5, atol=1e-8, err_msg=k)

    def test_rec_embedding_reuse_matches_reencode(self, rng, monkeypatch):
        """The 'converted' contrastive embedding reuses the rec pass's
        content output (TDVC_REUSE_REC_EMB=1, default) instead of
        re-encoding stop_gradient(fake). Same math; only conv-tiling
        roundoff differs (the re-encode ran at 2B inside the batched
        encode-only call, the reused one at B inside the rec apply)."""
        cfg = tiny_cfg(no_conv=False, lambda_rec=2.0, lambda_idt=1.0,
                       lambda_f0=1.0, lambda_cont_emb=1.0,
                       lambda_corrupted=1.0, lambda_converted=1.0)
        G, D, C, st, opts = build_all(cfg)
        batch = fake_batch(rng)
        key = jax.random.PRNGKey(7)
        out = {}
        for flag in ("1", "0"):
            monkeypatch.setenv("TDVC_REUSE_REC_EMB", flag)
            step = jax.jit(step_mod.build_train_step(cfg, G, D, C, opts))
            st1, m1 = step(st, batch, key)
            _, m2 = step(st1, batch, jax.random.PRNGKey(8))
            out[flag] = {**{k: float(v) for k, v in m1.items()},
                         "step2_G_loss": float(m2["G_loss"])}
        for k in out["1"]:
            np.testing.assert_allclose(
                out["1"][k], out["0"][k], rtol=1e-5, atol=1e-8, err_msg=k)

    def test_generator_decode_from_content_matches_fused(self, rng):
        cfg = tiny_cfg()
        G, D, C, st, opts = build_all(cfg)
        x = jnp.asarray(0.1 * rng.standard_normal((2, SEG, 1)), jnp.float32)
        exc = jnp.asarray(0.1 * rng.standard_normal((2, SEG, 1)), jnp.float32)
        c = jax.nn.one_hot(jnp.array([1, 3]), NUM_SPK)
        wav_f, subs_f, cont_f = jax.jit(G.apply)(st.params_g, x, c, None, exc)
        cont = jax.jit(lambda p, x: G.apply(p, x, None, None, None,
                                            encode_only=True))(st.params_g, x)
        wav_s, subs_s, cont_s = jax.jit(
            lambda p, c2, e, ct: G.apply(p, None, c2, None, e, content=ct)
        )(st.params_g, c, exc, cont)
        assert np.array_equal(np.asarray(wav_f), np.asarray(wav_s))
        for a, b in zip(subs_f, subs_s):
            assert np.array_equal(np.asarray(a), np.asarray(b))
        assert np.array_equal(np.asarray(cont_f), np.asarray(cont_s))


class TestNoopBranchesAreCheap:
    def test_interval_noop_branches_are_structurally_tiny(self, rng):
        """The skipped-interval noop branches must NOT pay for a loss forward
        (VERDICT r2 weak #7): they return eval_shape-derived zeros, so their
        cond branch jaxprs stay ~constant-size while the update branches hold
        the full loss+grad graphs."""
        cfg = tiny_cfg(no_conv=False, lambda_rec=2.0, lambda_idt=1.0,
                       lambda_f0=1.0, lambda_cont_emb=1.0, lambda_latcls=1.0,
                       D_step_interval=2, G_step_interval=2)
        G, D, C, st, opts = build_all(cfg)
        ts = step_mod.build_train_step(cfg, G, D, C, opts)
        batch = fake_batch(rng)
        jaxpr = jax.make_jaxpr(ts)(st, batch, jax.random.PRNGKey(0))

        conds = []

        def walk(jx):
            for eqn in jx.eqns:
                if eqn.primitive.name == "cond":
                    sizes = sorted(len(b.jaxpr.eqns) for b in eqn.params["branches"])
                    conds.append(sizes)
                for v in eqn.params.values():
                    if hasattr(v, "jaxpr"):
                        walk(v.jaxpr if hasattr(v.jaxpr, "eqns") else v)
                    elif isinstance(v, (tuple, list)):
                        for b in v:
                            if hasattr(b, "jaxpr"):
                                walk(b.jaxpr)

        walk(jaxpr.jaxpr)
        # D, C, and G interval conds must all be present
        assert len(conds) >= 3, f"expected >=3 interval conds, got {len(conds)}"
        for sizes in conds:
            noop, update = sizes[0], sizes[-1]
            assert noop <= 80, f"noop branch too big: {sizes}"
            assert update > 5 * noop, f"branches suspiciously similar: {sizes}"


class TestEvalStep:
    def test_eval_metrics(self, rng):
        cfg = tiny_cfg()
        G, D, C, st, opts = build_all(cfg)
        ev = jax.jit(step_mod.build_eval_step(cfg, G, D, C))
        m = ev(st, fake_batch(rng), jax.random.PRNGKey(0))
        for key in ["val_loss_adv_real", "val_loss_adv_fake", "val_D_loss",
                    "val_G_loss", "val_loss_lat_cls", "val_C_acc"]:
            assert key in m and np.isfinite(float(m[key]))


class TestDataParallel:
    def test_sharded_step_on_8_devices(self, rng):
        assert jax.device_count() == 8
        cfg = tiny_cfg(batch_size=8, lambda_f0=1.0, lambda_cont_emb=1.0)
        G, D, C, st, opts = build_all(cfg)
        mesh = parallel.create_mesh()
        repl = parallel.replicated_sharding(mesh)
        bsh = parallel.batch_sharding(mesh)

        st = jax.device_put(st, repl)
        batch = jax.device_put(fake_batch(rng, b=8), bsh)

        ts = jax.jit(
            step_mod.build_train_step(cfg, G, D, C, opts, mesh=mesh),
            in_shardings=(repl, bsh, repl),
            out_shardings=(repl, repl),
        )
        st2, metrics = ts(st, batch, jax.random.PRNGKey(3))
        assert int(st2.step) == 1
        assert np.isfinite(float(metrics["G_loss"]))
        # params stay replicated
        leaf = jax.tree.leaves(st2.params_g)[0]
        assert leaf.sharding.is_fully_replicated
