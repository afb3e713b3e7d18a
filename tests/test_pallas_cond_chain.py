"""Parity tests for the fused FiLM cond-chain Pallas kernel.

Runs the kernel in interpret mode on CPU against the stage-batched XLA
formulation (the exact math of MRFBlock._batched_film / reference
model/generator.py:96-105): forward values and every input cotangent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from td_vc_gan_tpu.ops.pallas import cond_chain


def _ref_chain(c, w0, b0, w1, b1, n):
    """Zero-'same' conv -> lrelu -> per-block zero-'same' conv, packed into
    the kernel's (B, T, roundup(n*two_c, 128)) output layout."""
    cc = c.shape[2]
    two_c = w1.shape[2] // n
    h = jax.lax.conv_general_dilated(
        c, w0, (1,), [(1, 1)], dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    ) + b0
    a = jnp.where(h >= 0, h, cond_chain.LEAKY_SLOPE * h)
    outs = []
    for i in range(n):
        gb = jax.lax.conv_general_dilated(
            a[..., i * cc:(i + 1) * cc], w1[..., i * two_c:(i + 1) * two_c],
            (1,), [(1, 1)], dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32,
        ) + b1[i * two_c:(i + 1) * two_c]
        outs.append(gb)
    packed = jnp.concatenate(outs, axis=-1)
    ncp = cond_chain._rup(n * two_c, 128)
    if ncp > n * two_c:
        packed = jnp.pad(packed, ((0, 0), (0, 0), (0, ncp - n * two_c)))
    return packed


def _make_inputs(b=2, t=96, cc=12, n=3, two_c=8, seed=0):
    rng = np.random.default_rng(seed)

    def r(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 0.3)

    return (r(b, t, cc), r(3, cc, n * cc), r(n * cc),
            r(3, cc, n * two_c), r(n * two_c))


class TestForward:
    def test_matches_reference(self):
        c, w0, b0, w1, b1 = _make_inputs()
        got = cond_chain.film_cond_chain(c, w0, b0, w1, b1, interpret=True)
        want = _ref_chain(c, w0, b0, w1, b1, n=3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_multi_tile_equals_single_tile_math(self):
        # t=96 tiles as 3x32: tiling must not change edge semantics
        c, w0, b0, w1, b1 = _make_inputs(t=96, seed=1)
        got = cond_chain.film_cond_chain(c, w0, b0, w1, b1, interpret=True)
        want = _ref_chain(c, w0, b0, w1, b1, n=3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_single_block(self):
        c, w0, b0, w1, b1 = _make_inputs(n=1, cc=16, two_c=4, seed=2)
        got = cond_chain.film_cond_chain(c, w0, b0, w1, b1, interpret=True)
        want = _ref_chain(c, w0, b0, w1, b1, n=1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


class TestBackward:
    def test_all_grads_match_reference(self):
        c, w0, b0, w1, b1 = _make_inputs(seed=3)
        # weight the output so every position gets a distinct cotangent
        # (including the zero-padding columns, whose grads must not leak)
        rng = np.random.default_rng(9)
        wgt = jnp.asarray(rng.standard_normal((2, 96, 128)).astype(np.float32))

        def loss_kernel(c, w0, b0, w1, b1):
            out = cond_chain.film_cond_chain(c, w0, b0, w1, b1, interpret=True)
            return jnp.sum(out * wgt)

        def loss_ref(c, w0, b0, w1, b1):
            return jnp.sum(_ref_chain(c, w0, b0, w1, b1, n=3) * wgt)

        gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4))(c, w0, b0, w1, b1)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(c, w0, b0, w1, b1)
        names = ["dc", "dw0", "db0", "dw1", "db1"]
        for name, a, b in zip(names, gk, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
                err_msg=f"gradient mismatch: {name}")

    def test_grads_multi_batch_tiles(self):
        c, w0, b0, w1, b1 = _make_inputs(b=3, t=64, cc=8, n=2, two_c=6, seed=4)
        wgt = jnp.asarray(
            np.random.default_rng(5).standard_normal((3, 64, 128)).astype(np.float32))

        def loss_kernel(c):
            return jnp.sum(cond_chain.film_cond_chain(
                c, w0, b0, w1, b1, interpret=True) * wgt)

        def loss_ref(c):
            return jnp.sum(_ref_chain(c, w0, b0, w1, b1, n=2) * wgt)

        np.testing.assert_allclose(
            np.asarray(jax.grad(loss_kernel)(c)),
            np.asarray(jax.grad(loss_ref)(c)), rtol=2e-4, atol=2e-4)


class TestSupports:
    def test_full_and_half_rate_stages_supported(self):
        assert cond_chain.supports(8960, 9, 136, 32)
        assert cond_chain.supports(4480, 9, 136, 64)

    def test_unsupported_shapes(self):
        assert not cond_chain.supports(97, 9, 136, 32)   # prime-ish T
        assert not cond_chain.supports(2240, 9, 136, 128)  # VMEM blowout
        assert not cond_chain.supports(560, 9, 136, 2048)  # VMEM blowout
