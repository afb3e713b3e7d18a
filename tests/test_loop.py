"""Tests for training-loop helpers (sample dumps, shape buckets)."""

import types

import jax
import numpy as np
import pytest

from td_vc_gan_tpu.config import Config
from td_vc_gan_tpu.models import crepe as crepe_mod
from td_vc_gan_tpu.models.generator import generator_from_config
from td_vc_gan_tpu.training import loop as loop_mod


def _tiny_cfg():
    cfg = Config()
    g = cfg.model.generator
    g.decoder_ratios = [10, 4, 2, 2]
    g.decoder_channels = [32, 16, 8, 8, 4]
    g.content_dim = 8
    g.conditional_dim = 8
    g.mrf_kernel_sizes = [3]
    g.mrf_dilations = [1, 3]
    cfg.test.max_segment = 8960
    cfg.log.gen_num = 2
    return cfg


class TestPadBucket:
    def test_pads_to_quantum(self):
        out = loop_mod._pad_bucket(np.ones(5000, np.float32), 71680)
        assert out.shape == (8960,) and out[:5000].all() and not out[5000:].any()

    def test_caps_long_signals(self):
        out = loop_mod._pad_bucket(np.ones(100000, np.float32), 17920)
        assert out.shape == (17920,)


class TestGenerateSamples:
    def test_jitted_dump_writes_wavs(self, tmp_path):
        cfg = _tiny_cfg()
        num_spk = 4
        G = generator_from_config(cfg.model.generator, num_spk)
        import jax.numpy as jnp

        x = jnp.zeros((1, 8960, 1))
        onehot = jax.nn.one_hot(jnp.zeros((1,), jnp.int32), num_spk)
        pg = jax.jit(G.init)(jax.random.PRNGKey(0), x, onehot, None,
                             jnp.zeros((1, 8960, 1)))
        crepe_params = jax.jit(crepe_mod.init_crepe)(jax.random.PRNGKey(1))
        state = types.SimpleNamespace(params_g=pg, crepe_params=crepe_params)

        entries = []
        rng = np.random.default_rng(0)
        for i in range(2):
            sig = (0.2 * np.sin(2 * np.pi * 150 * np.arange(6400) / 16000)
                   + 0.01 * rng.standard_normal(6400))
            from td_vc_gan_tpu.data.audio_io import write_audio

            write_audio(tmp_path / f"u{i}.wav", sig, 16000)
            entries.append((str(tmp_path / f"u{i}.wav"), f"spk{i}"))

        ds = types.SimpleNamespace(
            __len__=lambda self: 2,
            num_spk=num_spk,
        )

        class _DS:
            num_spk = 4

            def __len__(self):
                return 2

            def __getitem__(self, i):
                from td_vc_gan_tpu.data.audio_io import read_audio

                sig, _ = read_audio(entries[i][0], 16000)
                return {"signal": sig.astype(np.float32), "label": np.int32(i)}

        logs = []
        (tmp_path / "generated").mkdir()
        loop_mod._generate_samples(cfg, G, state, _DS(), tmp_path, 0,
                                   jax.random.PRNGKey(2), logs.append)
        wavs = sorted((tmp_path / "generated").glob("*.wav"))
        # 2 samples x (conv, orig, rec)
        assert len(wavs) == 6
        assert any("s/sample" in m for m in logs)
        # second call reuses the compiled program (cache keyed by length)
        key = (id(G), 16000, 8960)
        assert key in loop_mod._SAMPLE_FN_CACHE
        # the entry pins G so a freed Generator's id can't serve a stale fn
        assert loop_mod._SAMPLE_FN_CACHE[key][0] is G
