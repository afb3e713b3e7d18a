"""Parity tests for conv layers vs torch primitives (exact semantics)."""

import jax
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
