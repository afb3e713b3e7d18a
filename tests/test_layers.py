"""Parity tests for conv layers vs torch primitives (exact semantics)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np
import torch

from td_vc_gan_tpu.models import layers


def _run_conv1d(x_np, w_np, b_np, **kwargs):
    """Run our WNConv1d(use_weight_norm=False) with injected torch weights."""
    mod = layers.WNConv1d(
        features=w_np.shape[0], use_weight_norm=False, use_bias=b_np is not None, **kwargs
    )
    x = jnp.asarray(x_np.transpose(0, 2, 1))  # NCW -> NWC
    params = mod.init(jax.random.PRNGKey(0), x)
    kernel = jnp.asarray(w_np.transpose(2, 1, 0))  # (out,in/g,k) -> (k,in/g,out)
    p = {"params": {"kernel": kernel}}
    if b_np is not None:
        p["params"]["bias"] = jnp.asarray(b_np)
    assert jax.tree.map(jnp.shape, p) == jax.tree.map(jnp.shape, params)
    y = mod.apply(p, x)
    return np.asarray(y).transpose(0, 2, 1)  # back to NCW


class TestConv1dParity:
    def test_basic_strided(self, rng):
        x = rng.standard_normal((2, 3, 40)).astype(np.float32)
        w = rng.standard_normal((8, 3, 9)).astype(np.float32)
        b = rng.standard_normal(8).astype(np.float32)
        ours = _run_conv1d(x, w, b, kernel_size=9, stride=4, padding=20)
        ref = torch.nn.functional.conv1d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b), stride=4, padding=20
        )
        np.testing.assert_allclose(ours, ref.numpy(), atol=1e-4)

    def test_dilated_reflect(self, rng):
        x = rng.standard_normal((1, 4, 50)).astype(np.float32)
        w = rng.standard_normal((4, 4, 3)).astype(np.float32)
        pad = 5  # dilation*(k-1)//2 for d=5,k=3
        ours = _run_conv1d(x, w, None, kernel_size=3, dilation=5, padding=pad, pad_mode="reflect")
        xr = torch.nn.functional.pad(torch.from_numpy(x), (pad, pad), mode="reflect")
        ref = torch.nn.functional.conv1d(xr, torch.from_numpy(w), dilation=5)
        np.testing.assert_allclose(ours, ref.numpy(), atol=1e-4)

    def test_grouped(self, rng):
        # discriminator-style: k=41, stride 4, groups=4 (discriminator.py:26-31)
        x = rng.standard_normal((2, 16, 64)).astype(np.float32)
        w = rng.standard_normal((64, 4, 41)).astype(np.float32)
        ours = _run_conv1d(x, w, None, kernel_size=41, stride=4, padding=20, groups=4)
        ref = torch.nn.functional.conv1d(
            torch.from_numpy(x), torch.from_numpy(w), stride=4, padding=20, groups=4
        )
        np.testing.assert_allclose(ours, ref.numpy(), atol=1e-4)

    def test_same_padding(self, rng):
        x = rng.standard_normal((1, 4, 30)).astype(np.float32)
        w = rng.standard_normal((6, 4, 5)).astype(np.float32)
        ours = _run_conv1d(x, w, None, kernel_size=5, padding="same")
        ref = torch.nn.functional.conv1d(torch.from_numpy(x), torch.from_numpy(w), padding="same")
        np.testing.assert_allclose(ours, ref.numpy(), atol=1e-4)


class TestConvTransposeParity:
    def _check(self, rng, in_ch, out_ch, k, stride, padding, output_padding, L=24):
        x = rng.standard_normal((2, in_ch, L)).astype(np.float32)
        w = rng.standard_normal((in_ch, out_ch, k)).astype(np.float32)
        b = rng.standard_normal(out_ch).astype(np.float32)

        mod = layers.WNConvTranspose1d(
            out_ch, k, stride=stride, padding=padding, output_padding=output_padding,
            use_weight_norm=False,
        )
        xj = jnp.asarray(x.transpose(0, 2, 1))
        params = mod.init(jax.random.PRNGKey(0), xj)
        p = {"params": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}}
        assert jax.tree.map(jnp.shape, p) == jax.tree.map(jnp.shape, params)
        ours = np.asarray(mod.apply(p, xj)).transpose(0, 2, 1)

        ref = torch.nn.functional.conv_transpose1d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
            stride=stride, padding=padding, output_padding=output_padding,
        )
        assert ours.shape == tuple(ref.shape)
        np.testing.assert_allclose(ours, ref.numpy(), atol=1e-4)

    def test_even_ratio_10(self, rng):
        # decoder stage semantics: k=2r, stride=r, pad=r//2+r%2, outpad=r%2
        r = 10
        self._check(rng, 6, 4, 2 * r, r, r // 2 + r % 2, r % 2)

    def test_even_ratio_2(self, rng):
        r = 2
        self._check(rng, 4, 3, 2 * r, r, r // 2 + r % 2, r % 2)

    def test_odd_ratio_3(self, rng):
        r = 3
        self._check(rng, 4, 3, 2 * r, r, r // 2 + r % 2, r % 2)

    def test_output_length_is_input_times_ratio(self, rng):
        for r in (2, 3, 5, 8, 10):
            x = jnp.zeros((1, 7, 4))
            mod = layers.WNConvTranspose1d(2, 2 * r, r, r // 2 + r % 2, r % 2)
            y, _ = mod.init_with_output(jax.random.PRNGKey(0), x)
            assert y.shape == (1, 7 * r, 2)


class TestWeightNorm:
    def test_initial_effective_kernel_equals_v(self, rng):
        mod = layers.WNConv1d(8, 5, padding=2)
        x = jnp.asarray(rng.standard_normal((1, 20, 4)).astype(np.float32))
        params = mod.init(jax.random.PRNGKey(1), x)
        v = params["params"]["v"]
        g = params["params"]["g"]
        norms = np.sqrt((np.asarray(v) ** 2).sum(axis=(0, 1)))
        np.testing.assert_allclose(np.asarray(g), norms, rtol=1e-6)

    def test_scaling_g_scales_output(self, rng):
        mod = layers.WNConv1d(3, 3, padding=1, use_bias=False)
        x = jnp.asarray(rng.standard_normal((1, 10, 2)).astype(np.float32))
        params = mod.init(jax.random.PRNGKey(1), x)
        y1 = mod.apply(params, x)
        p2 = jax.tree.map(lambda a: a, params)
        p2["params"]["g"] = params["params"]["g"] * 2.0
        y2 = mod.apply(p2, x)
        np.testing.assert_allclose(np.asarray(y2), 2 * np.asarray(y1), rtol=1e-5)


class TestNorms:
    def test_instance_norm_matches_torch(self, rng):
        x = rng.standard_normal((2, 6, 30)).astype(np.float32)  # NCW
        ours = layers.InstanceNorm().apply({}, jnp.asarray(x.transpose(0, 2, 1)))
        ref = torch.nn.InstanceNorm1d(6)(torch.from_numpy(x))
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 2, 1), ref.numpy(), atol=1e-5
        )

    def test_cin_shapes(self, rng):
        mod = layers.ConditionalInstanceNorm(8)
        x = jnp.asarray(rng.standard_normal((2, 20, 8)).astype(np.float32))
        c2 = jnp.asarray(rng.standard_normal((2, 5)).astype(np.float32))
        y, _ = mod.init_with_output(jax.random.PRNGKey(0), x, c2)
        assert y.shape == x.shape
        c3 = jnp.asarray(rng.standard_normal((2, 20, 5)).astype(np.float32))
        y3, _ = mod.init_with_output(jax.random.PRNGKey(0), x, c3)
        assert y3.shape == x.shape


class TestGradReverse:
    def test_identity_forward_negated_backward(self):
        x = jnp.arange(4.0)
        np.testing.assert_allclose(np.asarray(layers.grad_reverse(x)), np.asarray(x))
        g = jax.grad(lambda a: jnp.sum(layers.grad_reverse(a) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g), -2 * np.asarray(x))


class TestBlocks:
    def test_film_resblock_shapes_and_cond_effect(self, rng):
        mod = layers.FiLMResnetBlock(8, 4, dilation=3, kernel_size=7)
        x = jnp.asarray(rng.standard_normal((2, 24, 8)).astype(np.float32))
        c = jnp.asarray(rng.standard_normal((2, 24, 4)).astype(np.float32))
        y, params = mod.init_with_output(jax.random.PRNGKey(0), x, c)
        assert y.shape == x.shape
        y2 = mod.apply(params, x, c * 2.0)
        assert np.abs(np.asarray(y2 - y)).max() > 1e-6

    def test_mrf_block(self, rng):
        mod = layers.MRFBlock(8, 4)
        x = jnp.asarray(rng.standard_normal((1, 16, 8)).astype(np.float32))
        c = jnp.asarray(rng.standard_normal((1, 16, 4)).astype(np.float32))
        y, params = mod.init_with_output(jax.random.PRNGKey(0), x, c)
        assert y.shape == x.shape
        # 3 kernel sizes x 3 dilations = 9 FiLM blocks
        n_film = len([k for k in params["params"] if k.startswith("block_")])
        assert n_film == 9


class TestComputeDtypeScope:
    """cfg.train.compute_dtype policy: bf16 compute under the scope must be
    a no-op by default and numerically close to f32 when active."""

    def _tiny_gen(self):
        from td_vc_gan_tpu.models.generator import Generator

        return Generator(
            decoder_ratios=(4, 2, 2), decoder_channels=(16, 8, 8, 4),
            num_bottleneck_layers=0, num_classes=3, conditional_dim=8,
            content_dim=6, kernel_sizes=(3,), dilations=(1, 3),
        )

    def test_scope_casts_and_restores(self):
        from td_vc_gan_tpu.models import layers as L

        assert L.get_compute_dtype() is None
        with L.compute_dtype_scope("bfloat16"):
            assert L.get_compute_dtype() == jnp.bfloat16
            with L.compute_dtype_scope(None):
                assert L.get_compute_dtype() is None
            assert L.get_compute_dtype() == jnp.bfloat16
        assert L.get_compute_dtype() is None

    def test_generator_bf16_close_to_f32(self, rng):
        from td_vc_gan_tpu.models import layers as L

        G = self._tiny_gen()
        x = jnp.asarray(0.2 * rng.standard_normal((2, 320, 1)), jnp.float32)
        exc = jnp.asarray(0.1 * rng.standard_normal((2, 320, 1)), jnp.float32)
        onehot = jax.nn.one_hot(jnp.array([0, 2]), 3)
        params = G.init(jax.random.PRNGKey(0), x, onehot, None, exc)

        wav32, subs32, cont32 = G.apply(params, x, onehot, None, exc)
        with L.compute_dtype_scope("bfloat16"):
            wav16, subs16, cont16 = jax.jit(
                lambda p, a, c, e: G.apply(p, a, c, None, e)
            )(params, x, onehot, exc)

        # outputs are finalized back to f32 ...
        assert wav16.dtype == jnp.float32 and cont16.dtype == jnp.float32
        # ... and close to the f32 path (tanh-bounded waveform)
        assert float(jnp.abs(wav16 - wav32).max()) < 0.05
        assert float(jnp.abs(cont16 - cont32).max()) < 0.05

    def test_train_step_bf16_finite(self, rng):
        """One fused GAN step under compute_dtype=bfloat16: finite losses,
        f32 params preserved."""
        from td_vc_gan_tpu.config import Config
        from td_vc_gan_tpu.models import crepe as crepe_mod
        from td_vc_gan_tpu.models import (
            CollaborativeMultibandDiscriminator,
            LatentClassifier,
        )
        from td_vc_gan_tpu.models.generator import generator_from_config
        from td_vc_gan_tpu.training import state as state_mod
        from td_vc_gan_tpu.training import step as step_mod

        cfg = Config()
        g = cfg.model.generator
        g.decoder_ratios = [10, 4, 2, 2]
        g.decoder_channels = [32, 16, 8, 8, 4]
        g.content_dim = 8
        g.conditional_dim = 8
        g.mrf_kernel_sizes = [3]
        g.mrf_dilations = [1, 3]
        cfg.model.discriminator.num_channels_base = 4
        cfg.train.max_segment = 1280
        cfg.train.batch_size = 2
        cfg.train.mel_fft_sizes = [512]
        cfg.train.compute_dtype = "bfloat16"
        num_spk = 3

        G = generator_from_config(g, num_spk, compute_dtype="bfloat16")
        dc = cfg.model.discriminator
        D = CollaborativeMultibandDiscriminator(
            num_disc=dc.num_disc, num_classes=num_spk,
            num_layers=dc.num_layers, num_channels_base=dc.num_channels_base)
        C = LatentClassifier(num_classes=num_spk)

        key = jax.random.PRNGKey(0)
        x = jnp.zeros((1, 1280, 1))
        onehot = jax.nn.one_hot(jnp.zeros((1,), jnp.int32), num_spk)
        pg = jax.jit(G.init)(key, x, onehot, None, jnp.zeros((1, 1280, 1)))
        pd = jax.jit(D.init)(key, x, jnp.zeros((1,), jnp.int32),
                             D.get_subsamples(x, dc.num_disc))
        pc = jax.jit(C.init)(key, jnp.zeros((1, 4, g.content_dim)))
        crepe_params = jax.jit(crepe_mod.init_crepe)(key)
        state, opts = state_mod.create_train_state(cfg, pg, pd, pc, crepe_params)

        step = jax.jit(step_mod.build_train_step(cfg, G, D, C, opts))
        batch = {
            "signal": jnp.asarray(0.1 * rng.standard_normal((2, 1280)), jnp.float32),
            "corrupted": jnp.asarray(0.1 * rng.standard_normal((2, 1280)), jnp.float32),
            "label": jnp.asarray([0, 1], jnp.int32),
        }
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
        for k, v in metrics.items():
            assert bool(jnp.isfinite(v).all()), k
        leaf = jax.tree_util.tree_leaves(new_state.params_g)[0]
        assert leaf.dtype == jnp.float32  # master params stay f32


class TestPackedConv:
    """The space-to-depth conv path (OFF by default, TDVC_PACKED_CONV=1) must
    stay numerically equivalent to the direct lax conv — values and grads."""

    def test_matches_direct_conv(self):
        import numpy as np

        from td_vc_gan_tpu.models import layers as L

        rng = np.random.default_rng(0)
        for cin, cout, k, d, t in [
            (16, 16, 3, 1, 64), (16, 16, 11, 5, 64), (32, 32, 3, 3, 96),
            (64, 64, 7, 1, 32), (1, 16, 3, 1, 40), (16, 32, 5, 2, 80),
        ]:
            x = jnp.asarray(rng.standard_normal((2, t, cin)).astype(np.float32))
            w = jnp.asarray(rng.standard_normal((k, cin, cout)).astype(np.float32))
            p = (k * d - d) // 2
            pl, pr = p, k * d - d - p
            xp = jnp.pad(x, ((0, 0), (pl, pr), (0, 0)))

            def ref(w):
                return jax.lax.conv_general_dilated(
                    x, w, (1,), [(pl, pr)], rhs_dilation=(d,),
                    dimension_numbers=("NWC", "WIO", "NWC"),
                )

            c = max(cin, cout)
            r = 128 // c
            while r > 1 and t % r:
                r //= 2
            got = L._packed_conv1d(xp, w, d, r, t)
            assert jnp.max(jnp.abs(ref(w) - got)) < 1e-4, (cin, cout, k, d)
            g1 = jax.grad(lambda w: jnp.sum(ref(w) ** 2))(w)
            g2 = jax.grad(lambda w: jnp.sum(L._packed_conv1d(xp, w, d, r, t) ** 2))(w)
            assert jnp.max(jnp.abs(g1 - g2)) / (jnp.max(jnp.abs(g1)) + 1e-9) < 1e-4


class TestReflectConvEdgeFix:
    """_reflect_conv (zero-pad conv + edge corrections) must match an
    explicit reflect-padded conv exactly, values and gradients."""

    @pytest.mark.parametrize("k,dil,pads,t", [
        (3, 1, (1, 1), 32),
        (3, 3, (3, 3), 48),
        (3, 5, (5, 5), 48),
        (7, 1, (3, 3), 40),
        (5, 2, (4, 4), 40),
        (3, 1, (2, 1), 32),   # asymmetric
        (11, 5, (25, 25), 64),  # widest MRF conv (largest edge span)
        (3, 1, (0, 1), 16),   # one-sided: no left correction
        (3, 1, (1, 0), 16),   # one-sided: no right correction
    ])
    def test_matches_explicit_reflect_pad(self, k, dil, pads, t):
        from td_vc_gan_tpu.models.layers import _reflect_conv

        rng = np.random.default_rng(k * 100 + dil)
        x = jnp.asarray(rng.standard_normal((2, t, 5)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((k, 5, 4)).astype(np.float32))

        def explicit(x, w):
            xp = jnp.pad(x, ((0, 0), pads, (0, 0)), mode="reflect")
            return jax.lax.conv_general_dilated(
                xp, w, (1,), [(0, 0)], rhs_dilation=(dil,),
                dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=jnp.float32)

        got = _reflect_conv(x, w, pads, dil, jnp.float32)
        want = explicit(x, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

        gx_got, gw_got = jax.grad(
            lambda x, w: jnp.sum(_reflect_conv(x, w, pads, dil, jnp.float32) ** 2),
            argnums=(0, 1))(x, w)
        gx_want, gw_want = jax.grad(
            lambda x, w: jnp.sum(explicit(x, w) ** 2), argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx_got), np.asarray(gx_want),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw_got), np.asarray(gw_want),
                                   rtol=1e-4, atol=1e-4)


class TestSplitCondChain:
    """The split FiLM cond chain (layers.py _split_film) must equal the
    concat formulation exactly: conv(concat(broadcast(spk), exc)) with a
    'same' zero pad decomposes into conv(exc) + a time-constant speaker
    matmul with edge corrections for the taps that cross the pad."""

    def _setup(self, seed=0, B=2, T=96, C=16, S=128, E=8,
               dilations=(1, 3), kernel_sizes=(3, 7)):
        from td_vc_gan_tpu.models.layers import MRFBlock

        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
        spk = jnp.asarray(rng.standard_normal((B, S)).astype(np.float32))
        exc = jnp.asarray(rng.standard_normal((B, T, E)).astype(np.float32))
        cond = jnp.concatenate(
            [jnp.broadcast_to(spk[:, None, :], (B, T, S)), exc], axis=-1)
        m = MRFBlock(C, S + E, dilations=dilations, kernel_sizes=kernel_sizes)
        params = m.init(jax.random.PRNGKey(seed), x, cond)
        return m, params, x, spk, exc, cond

    def test_param_tree_identical(self):
        from td_vc_gan_tpu.models.layers import MRFBlock

        m, params, x, spk, exc, cond = self._setup()
        params_tuple = m.init(jax.random.PRNGKey(0), x, (spk, exc))
        a = jax.tree_util.tree_map(lambda v: v.shape, params)
        b = jax.tree_util.tree_map(lambda v: v.shape, params_tuple)
        assert str(a) == str(b)

    def test_forward_and_grad_match_concat(self):
        m, params, x, spk, exc, cond = self._setup()
        y_concat = m.apply(params, x, cond)
        y_split = m.apply(params, x, (spk, exc))
        np.testing.assert_allclose(np.asarray(y_split), np.asarray(y_concat),
                                   rtol=1e-5, atol=1e-5)

        def loss(p, use_split):
            c = (spk, exc) if use_split else cond
            return jnp.sum(m.apply(p, x, c) ** 2)

        g_concat = jax.grad(loss)(params, False)
        g_split = jax.grad(loss)(params, True)
        for a, b in zip(jax.tree_util.tree_leaves(g_concat),
                        jax.tree_util.tree_leaves(g_split)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-3, atol=1e-3)

    def test_compat_gate_concats(self, monkeypatch):
        # TDVC_SPLIT_COND=0: the tuple input falls back to the concat path
        monkeypatch.setenv("TDVC_SPLIT_COND", "0")
        m, params, x, spk, exc, cond = self._setup(seed=3)
        y_concat = m.apply(params, x, cond)
        y_tuple = m.apply(params, x, (spk, exc))
        np.testing.assert_array_equal(np.asarray(y_tuple),
                                      np.asarray(y_concat))


class TestDeadVariantBlocks:
    """The reference's three never-instantiated residual blocks
    (generator.py:10-45,113-139), rebuilt for inventory completeness."""

    def test_tranform_block_matches_torch_replica(self, rng):
        ch, dil, k, t = 6, 2, 3, 32
        mod = layers.TranformResnetBlock(ch, dilation=dil, kernel_size=k)
        x = rng.standard_normal((2, t, ch)).astype(np.float32)
        params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))

        conv0 = torch.nn.Conv1d(ch, ch, k, dilation=dil, padding=dil, padding_mode="reflect")
        conv1 = torch.nn.Conv1d(ch, ch, 1)
        short = torch.nn.Conv1d(ch, ch, 1)
        with torch.no_grad():
            for tmod, name in ((conv0, "conv"), (conv1, "posconv"), (short, "shortcut")):
                p = params["params"][name]
                tmod.weight.copy_(torch.from_numpy(np.transpose(np.asarray(p["kernel"]), (2, 1, 0))))
                tmod.bias.copy_(torch.from_numpy(np.asarray(p["bias"])))
            xt = torch.from_numpy(x).transpose(1, 2)  # BCT
            lrelu = torch.nn.functional.leaky_relu
            inorm = torch.nn.InstanceNorm1d(ch)
            h = inorm(conv0(lrelu(xt, 0.2)))
            h = inorm(conv1(lrelu(h, 0.2)))
            want = (h + short(xt)).transpose(1, 2).numpy()
        got = np.asarray(mod.apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)

    def test_decoder_block_weight_normed_and_residual(self, rng):
        mod = layers.DecoderResnetBlock(8, dilation=4, kernel_size=3)
        x = jnp.asarray(rng.standard_normal((2, 40, 8)).astype(np.float32))
        y, params = mod.init_with_output(jax.random.PRNGKey(0), x)
        assert y.shape == x.shape
        # weight norm hardcoded like the reference: every conv carries (v, g)
        for name in ("conv", "posconv", "shortcut"):
            assert {"v", "g", "bias"} <= set(params["params"][name])

    def test_cin_block_cond_changes_output(self, rng):
        mod = layers.CINResnetBlock(8, dilation=3, kernel_size=5)
        x = jnp.asarray(rng.standard_normal((2, 24, 8)).astype(np.float32))
        c = jnp.asarray(rng.standard_normal((2, 12)).astype(np.float32))
        y, params = mod.init_with_output(jax.random.PRNGKey(0), x, c)
        assert y.shape == x.shape
        y2 = mod.apply(params, x, c * 3.0)
        assert np.abs(np.asarray(y2 - y)).max() > 1e-6
