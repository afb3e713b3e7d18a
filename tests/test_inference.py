"""Converter tests: bucketing, single/batch equivalence, long-audio OLA."""

import jax
import numpy as np
import pytest

from td_vc_gan_tpu import config as cfg_mod
from td_vc_gan_tpu.inference import Converter
from td_vc_gan_tpu.models import crepe as crepe_mod
from td_vc_gan_tpu.models.generator import Generator


@pytest.fixture(scope="module")
def converter():
    cfg = cfg_mod.Config()
    cfg.model.generator.decoder_ratios = [10, 4, 2, 2]
    cfg.model.generator.decoder_channels = [16, 16, 8, 8, 4]
    cfg.model.generator.content_dim = 8
    cfg.model.generator.conditional_dim = 8
    cfg.model.generator.mrf_kernel_sizes = [3]
    cfg.model.generator.mrf_dilations = [1]
    cfg.train.max_segment = 1280
    G = Generator(
        decoder_ratios=(10, 4, 2, 2), decoder_channels=(16, 16, 8, 8, 4),
        num_bottleneck_layers=0, num_classes=4, conditional_dim=8, content_dim=8,
        kernel_sizes=(3,), dilations=(1,),
    )
    import jax.numpy as jnp

    x = jnp.zeros((1, 1280, 1))
    oh = jax.nn.one_hot(jnp.zeros((1,), jnp.int32), 4)
    params = jax.jit(G.init)(jax.random.PRNGKey(0), x, oh, None, jnp.zeros((1, 1280, 1)))
    crepe_params = jax.jit(crepe_mod.init_crepe)(jax.random.PRNGKey(1))
    return Converter(cfg, G, params, crepe_params, decoder="argmax")


class TestConverter:
    def test_pad_to_bucket(self, converter):
        padded, n = converter.pad_to_bucket(np.zeros(1000, np.float32))
        assert n == 1000 and padded.shape[0] == 1280

    def test_convert_shapes_and_finite(self, converter, rng):
        sig = 0.2 * np.sin(2 * np.pi * 150 * np.arange(2000) / 16000).astype(np.float32)
        f0, mu = converter.pitch(sig)
        out = converter.convert(sig, 1, f0, mu, mu)
        assert out.shape == (2000,)
        assert np.isfinite(out).all() and np.abs(out).max() <= 1.0

    def test_batch_deterministic_and_consistent(self, converter, rng):
        # excitation noise is drawn per batch row (reference semantics:
        # util/__init__.py:45), so batch rows are NOT bitwise equal to a
        # batch-1 call; the contract is determinism given (inputs, seed).
        sig = (0.2 * np.sin(2 * np.pi * 200 * np.arange(2560) / 16000)).astype(np.float32)
        f0, mu = converter.pitch(sig)
        padded, n = converter.pad_to_bucket(sig)
        args = (
            np.repeat(padded[None], 3, 0), np.array([2, 1, 2], np.int32),
            np.repeat(f0, 3, 0), np.repeat(mu, 3, 0), np.repeat(mu, 3, 0),
        )
        batch1 = converter.convert_batch(*args, seed=7)[:, :n]
        batch2 = converter.convert_batch(*args, seed=7)[:, :n]
        np.testing.assert_array_equal(batch1, batch2)
        assert batch1.shape == (3, n)
        # different target labels produce different audio
        assert np.abs(batch1[0] - batch1[1]).max() > 1e-6

    def test_convert_with_ratio(self, converter, rng):
        sig = (0.2 * np.sin(2 * np.pi * 180 * np.arange(1280) / 16000)).astype(np.float32)
        out = converter.convert_with_ratio(sig, 0, 1.5)
        assert out.shape == sig.shape and np.isfinite(out).all()

    def test_convert_long_overlap_add(self, converter, rng):
        sig = (0.2 * np.sin(2 * np.pi * 160 * np.arange(9000) / 16000)).astype(np.float32)
        out = converter.convert_long(sig, 1, mu_tgt=np.log(200.0), chunk=3840, overlap=1280)
        assert out.shape == sig.shape
        assert np.isfinite(out).all()

    def test_convert_long_sharded_matches_single_device(self, converter, rng):
        # SPMD correctness: the device-parallel OLA path must be
        # sharding-invariant — same values on a 1-device and an 8-device mesh.
        from td_vc_gan_tpu import parallel

        sig = (0.2 * np.sin(2 * np.pi * 170 * np.arange(20000) / 16000)).astype(np.float32)
        kw = dict(chunk=3840, overlap=1280, seed=3)
        out8 = converter.convert_long_sharded(
            sig, 2, np.log(220.0), parallel.create_mesh(len(jax.devices())), **kw)
        out1 = converter.convert_long_sharded(
            sig, 2, np.log(220.0), parallel.create_mesh(1), **kw)
        assert out8.shape == sig.shape and np.isfinite(out8).all()
        np.testing.assert_allclose(out8, out1, rtol=2e-4, atol=2e-5)


class TestNoWeightConstants:
    """Serving programs must take params as jit ARGUMENTS, not closure
    captures: jit embeds closed-over arrays as literal constants in the
    lowered program, which (a) serialized ~1.2 GB of WavLM weights into
    every remote-compile RPC — the round-4 relay Broken-pipe/hang on every
    conversion compile while train-step compiles (params ride in ``state``)
    succeeded — and (b) forces a full retrace on checkpoint reload."""

    def test_convert_program_is_weight_free(self, converter, rng):
        import jax.numpy as jnp

        n = 1280
        sigs = rng.standard_normal((2, n)).astype(np.float32)
        converter._convert_fn(n)  # build the jitted fn
        lowered = converter._convert_inner.lower(
            converter._dev_params_g, jnp.asarray(sigs),
            jnp.zeros((2, n // 64 + 1), jnp.float32), jnp.zeros((2, 1)),
            jnp.zeros((2, 1)), jnp.zeros((2,), jnp.int32),
            jax.random.PRNGKey(0),
        )
        text = lowered.as_text()
        # param-sized literals would blow the StableHLO text far past this
        # (the tiny fixture's params alone are ~100 KB as decimal literals;
        # the real flagship's are ~GBs)
        assert len(text) < 2_000_000, (
            f"convert program text is {len(text)/1e6:.1f} MB — weights are "
            f"being embedded as constants again")

    def test_params_device_cache_reused(self, converter):
        f1 = converter._convert_fn(1280)
        f2 = converter._convert_fn(640)
        assert f1 is f2  # one program cache per instance
        assert converter._dev_params_g is not None
