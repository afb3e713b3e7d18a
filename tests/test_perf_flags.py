"""Perf flags promoted from ambient TDVC_* env vars into the typed config
(round-4, VERDICT r3 weak #2 / next #4).

Pins: config -> PerfFlags resolution, YAML/--override round trip, env vars
as explicit per-process overrides (legacy A/B semantics preserved exactly),
scope binding at trace time inside build_train_step, and that a non-default
flag actually changes the traced program.
"""

import jax
import jax.numpy as jnp
import numpy as np

from td_vc_gan_tpu import perf
from td_vc_gan_tpu.config import Config, TrainConfig, load_config_str


def _clean_env(monkeypatch):
    for var in perf.ENV_VARS.values():
        monkeypatch.delenv(var, raising=False)


class TestResolution:
    def test_defaults_mirror_train_config(self, monkeypatch):
        _clean_env(monkeypatch)
        flags = perf.from_config(Config())
        tc = TrainConfig()
        for name in perf.ENV_VARS:
            assert getattr(flags, name) == getattr(tc, name)
        # measured-fastest defaults (CLAUDE.md round-3)
        assert flags.shared_enc and flags.split_cond and flags.cond_ckpt
        assert flags.reuse_rec_emb and not flags.fused_cond and not flags.packed_conv

    def test_yaml_round_trip(self, monkeypatch):
        _clean_env(monkeypatch)
        cfg = load_config_str("train:\n  split_cond: false\n  fused_cond: true\n")
        flags = perf.from_config(cfg)
        assert flags.split_cond is False and flags.fused_cond is True
        # and the config dump records them (checkpoint/launch reproducibility)
        d = cfg.to_dict()
        assert d["train"]["split_cond"] is False and d["train"]["fused_cond"] is True

    def test_env_overrides_config(self, monkeypatch):
        _clean_env(monkeypatch)
        cfg = load_config_str("train:\n  split_cond: false\n")
        flags = perf.from_config(cfg)
        assert perf.enabled("split_cond", flags) is False
        monkeypatch.setenv("TDVC_SPLIT_COND", "1")
        assert perf.enabled("split_cond", flags) is True
        monkeypatch.setenv("TDVC_SPLIT_COND", "0")
        assert perf.enabled("split_cond", flags) is False
        monkeypatch.setenv("TDVC_SPLIT_COND", "")  # empty = unset (legacy)
        assert perf.enabled("split_cond", flags) is False

    def test_scope_innermost_wins_and_restores(self, monkeypatch):
        _clean_env(monkeypatch)
        assert perf.enabled("split_cond") is True  # base defaults
        with perf.flags_scope(perf.PerfFlags(split_cond=False)):
            assert perf.enabled("split_cond") is False
            with perf.flags_scope(perf.PerfFlags(split_cond=True)):
                assert perf.enabled("split_cond") is True
            assert perf.enabled("split_cond") is False
        assert perf.enabled("split_cond") is True
        with perf.flags_scope(None):  # no-op scope
            assert perf.enabled("split_cond") is True

    def test_scope_restored_on_exception(self, monkeypatch):
        _clean_env(monkeypatch)
        try:
            with perf.flags_scope(perf.PerfFlags(packed_conv=True)):
                raise RuntimeError("boom")
        except RuntimeError:
            pass
        assert perf.enabled("packed_conv") is False


def _tiny_cfg(**train_kw):
    cfg = Config()
    g = cfg.model.generator
    g.decoder_ratios = [10, 4, 2, 2]
    g.decoder_channels = [16, 16, 8, 8, 4]
    g.content_dim = 8
    g.conditional_dim = 8
    g.mrf_kernel_sizes = [3]
    g.mrf_dilations = [1, 3]
    cfg.model.discriminator.num_channels_base = 4
    cfg.train.max_segment = 1280
    cfg.train.batch_size = 2
    cfg.train.mel_fft_sizes = [512]
    for k, v in train_kw.items():
        setattr(cfg.train, k, v)
    return cfg


def _build_step(cfg, num_spk=2):
    from td_vc_gan_tpu.models import (
        CollaborativeMultibandDiscriminator,
        LatentClassifier,
    )
    from td_vc_gan_tpu.models import crepe as crepe_mod
    from td_vc_gan_tpu.models.generator import generator_from_config
    from td_vc_gan_tpu.training import state as state_mod
    from td_vc_gan_tpu.training import step as step_mod

    seg = cfg.train.max_segment
    G = generator_from_config(cfg.model.generator, num_spk)
    dc = cfg.model.discriminator
    D = CollaborativeMultibandDiscriminator(
        num_disc=dc.num_disc, num_classes=num_spk, num_layers=dc.num_layers,
        num_channels_base=dc.num_channels_base,
    )
    C = LatentClassifier(num_classes=num_spk)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, seg, 1))
    onehot = jax.nn.one_hot(jnp.zeros((1,), jnp.int32), num_spk)
    pg = jax.jit(G.init)(key, x, onehot, None, jnp.zeros((1, seg, 1)))
    pd = jax.jit(D.init)(key, x, jnp.zeros((1,), jnp.int32),
                         D.get_subsamples(x, dc.num_disc))
    pc = jax.jit(C.init)(key, jnp.zeros((1, seg // 320, cfg.model.generator.content_dim)))
    crepe_params = jax.jit(crepe_mod.init_crepe)(key)
    state, opts = state_mod.create_train_state(cfg, pg, pd, pc, crepe_params)
    return state, step_mod.build_train_step(cfg, G, D, C, opts)


class TestStepBinding:
    def test_config_flag_changes_traced_program(self, monkeypatch):
        """split_cond=False via CONFIG (no env anywhere) must produce a
        different step HLO than the default — proof the flag reaches trace
        time through build_train_step's scope, not ambient env."""
        _clean_env(monkeypatch)
        state_a, step_a = _build_step(_tiny_cfg())
        state_b, step_b = _build_step(_tiny_cfg(split_cond=False))
        batch = {
            "signal": jnp.zeros((2, 1280), jnp.float32),
            "corrupted": jnp.zeros((2, 1280), jnp.float32),
            "label": jnp.zeros((2,), jnp.int32),
        }
        key = jax.random.PRNGKey(0)
        txt_a = jax.jit(step_a).lower(state_a, batch, key).as_text()
        txt_b = jax.jit(step_b).lower(state_b, batch, key).as_text()
        assert txt_a != txt_b

    def test_config_flag_metrics_equal_both_formulations(self, monkeypatch):
        """The split and concat cond-chain formulations are exact math
        (round-3): one real step under each config flag must agree."""
        _clean_env(monkeypatch)
        rng = np.random.default_rng(0)
        batch = {
            "signal": jnp.asarray(0.1 * rng.standard_normal((2, 1280)), jnp.float32),
            "corrupted": jnp.asarray(0.1 * rng.standard_normal((2, 1280)), jnp.float32),
            "label": jnp.asarray([0, 1], jnp.int32),
        }
        key = jax.random.PRNGKey(1)
        state_a, step_a = _build_step(_tiny_cfg())
        _, m_a = jax.jit(step_a)(state_a, batch, key)
        state_b, step_b = _build_step(_tiny_cfg(split_cond=False))
        _, m_b = jax.jit(step_b)(state_b, batch, key)
        for k in m_a:
            np.testing.assert_allclose(
                np.asarray(m_a[k]), np.asarray(m_b[k]), rtol=2e-5, atol=1e-5,
                err_msg=f"metric {k} differs between cond formulations")
