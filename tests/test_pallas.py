"""Pallas kernel tests (interpret mode on the CPU backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from td_vc_gan_tpu.ops.pallas import film_block as fb


def make_inputs(rng, b=2, t=64, c=8, k=3):
    x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    gamma = jnp.asarray(0.1 * rng.standard_normal((b, t, c)).astype(np.float32))
    beta = jnp.asarray(0.1 * rng.standard_normal((b, t, c)).astype(np.float32))
    w1 = jnp.asarray(0.2 * rng.standard_normal((k, c, c)).astype(np.float32))
    b1 = jnp.asarray(0.1 * rng.standard_normal(c).astype(np.float32))
    w2 = jnp.asarray(0.2 * rng.standard_normal((c, c)).astype(np.float32))
    b2 = jnp.asarray(0.1 * rng.standard_normal(c).astype(np.float32))
    return x, gamma, beta, w1, b1, w2, b2


class TestFusedFilmBlock:
    @pytest.mark.parametrize("k,dilation", [(3, 1), (3, 5), (7, 3), (11, 5)])
    def test_matches_reference_impl(self, rng, k, dilation):
        args = make_inputs(rng, t=128, c=8, k=k)
        ref = fb._reference_impl(*args, dilation=dilation)
        out = fb.fused_film_block(*args, dilation, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_matches_flax_film_resblock(self, rng):
        """End-to-end check against the production FiLMResnetBlock math
        (conv path only; the cond convs producing gamma/beta stay in XLA)."""
        from td_vc_gan_tpu.models.layers import FiLMResnetBlock

        c, t, ccond = 8, 64, 4
        mod = FiLMResnetBlock(c, ccond, dilation=3, kernel_size=3)
        x = jnp.asarray(rng.standard_normal((1, t, c)).astype(np.float32))
        cond = jnp.asarray(rng.standard_normal((1, t, ccond)).astype(np.float32))
        y_ref, params = mod.init_with_output(jax.random.PRNGKey(0), x, cond)

        p = params["params"]

        def wn_kernel(leaf):
            v, g = leaf["v"], leaf["g"]
            norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1)))
            return v * (g / norm)

        # recompute gamma/beta exactly like the module
        cv = jax.lax.conv_general_dilated(
            cond, wn_kernel(p["cond_0"]), (1,), "SAME",
            dimension_numbers=("NWC", "WIO", "NWC")) + p["cond_0"]["bias"]
        cv = jnp.where(cv >= 0, cv, 0.2 * cv)
        cv = jax.lax.conv_general_dilated(
            cv, wn_kernel(p["cond_1"]), (1,), "SAME",
            dimension_numbers=("NWC", "WIO", "NWC")) + p["cond_1"]["bias"]
        gamma, beta = jnp.split(cv, 2, axis=-1)

        out = fb.fused_film_block(
            x, gamma, beta,
            wn_kernel(p["conv"]), p["conv"]["bias"],
            wn_kernel(p["posconv"])[0], p["posconv"]["bias"],
            3, True,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(y_ref), atol=3e-5)

    def test_gradients_match_reference(self, rng):
        args = make_inputs(rng, t=64, c=8, k=3)

        def loss_pallas(*a):
            return jnp.sum(fb.fused_film_block(*a, 5, True) ** 2)

        def loss_ref(*a):
            return jnp.sum(fb._reference_impl(*a, dilation=5) ** 2)

        g1 = jax.grad(loss_pallas, argnums=(0, 3, 5))(*args)
        g2 = jax.grad(loss_ref, argnums=(0, 3, 5))(*args)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)
