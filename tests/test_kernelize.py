"""Hoisted weight-norm reconstruction (training/kernelize.py) must be
numerically identical to in-module weight norm: G_k.apply(kernelize(p))
== G.apply(p), same for the discriminator, including gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from td_vc_gan_tpu.config import Config
from td_vc_gan_tpu.models import CollaborativeMultibandDiscriminator
from td_vc_gan_tpu.models.generator import generator_from_config
from td_vc_gan_tpu.training.kernelize import kernelize


@pytest.fixture(scope="module")
def tiny_cfg():
    cfg = Config()
    g = cfg.model.generator
    g.decoder_ratios = [10, 4, 2, 2]
    g.decoder_channels = [32, 16, 8, 8, 4]
    g.content_dim = 8
    g.conditional_dim = 8
    g.mrf_kernel_sizes = [3]
    g.mrf_dilations = [1, 2]
    return cfg


class TestKernelize:
    def test_generator_equivalence(self, tiny_cfg):
        G = generator_from_config(tiny_cfg.model.generator, 4)
        G_k = G.clone(weight_norm=(False, False, False))
        key = jax.random.PRNGKey(0)
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 1280, 1)),
                        jnp.float32) * 0.1
        oh = jax.nn.one_hot(jnp.zeros((2,), jnp.int32), 4)
        exc = jnp.zeros((2, 1280, 1))
        p = jax.jit(G.init)(key, x[:1], oh[:1], None, exc[:1])
        tgt = jax.eval_shape(G_k.init, key, x[:1], oh[:1], None, exc[:1])
        pk = kernelize(p, tgt)

        y_ref, subs_ref, cont_ref = jax.jit(G.apply)(p, x, oh, None, exc)
        y_k, subs_k, cont_k = jax.jit(G_k.apply)(pk, x, oh, None, exc)
        assert jnp.max(jnp.abs(y_ref - y_k)) < 1e-6
        assert jnp.max(jnp.abs(cont_ref - cont_k)) < 1e-6
        for a, b in zip(subs_ref, subs_k):
            assert jnp.max(jnp.abs(a - b)) < 1e-6

        # gradient equivalence via the kernelize vjp chain
        def loss_ref(p):
            y, _, _ = G.apply(p, x, oh, None, exc)
            return jnp.mean(y * y)

        def loss_k(p):
            y, _, _ = G_k.apply(kernelize(p, tgt), x, oh, None, exc)
            return jnp.mean(y * y)

        g1 = jax.jit(jax.grad(loss_ref))(p)
        g2 = jax.jit(jax.grad(loss_k))(p)
        flat1 = jax.tree_util.tree_leaves(g1)
        flat2 = jax.tree_util.tree_leaves(g2)
        for a, b in zip(flat1, flat2):
            denom = jnp.max(jnp.abs(a)) + 1e-9
            assert jnp.max(jnp.abs(a - b)) / denom < 1e-4

    def test_discriminator_equivalence(self, tiny_cfg):
        D = CollaborativeMultibandDiscriminator(
            num_disc=2, num_classes=4, num_layers=2,
            num_channels_base=4, num_channel_mult=2, downsampling_factor=2,
        )
        D_k = D.clone(use_weight_norm=False)
        key = jax.random.PRNGKey(1)
        x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 1280, 1)),
                        jnp.float32) * 0.1
        lab = jnp.asarray([0, 1], jnp.int32)
        subs = D.get_subsamples(x, 2)
        p = jax.jit(D.init)(key, x[:1], lab[:1], tuple(s[:1] for s in subs))
        tgt = jax.eval_shape(D.clone(use_weight_norm=False).init, key, x[:1],
                             lab[:1], tuple(s[:1] for s in subs))
        pk = kernelize(p, tgt)
        out_ref, feats_ref = jax.jit(
            lambda p, x, lab: D.apply(p, x, lab, tuple(subs)))(p, x, lab)
        out_k, feats_k = jax.jit(
            lambda p, x, lab: D_k.apply(p, x, lab, tuple(subs)))(pk, x, lab)
        for a, b in zip(out_ref, out_k):
            assert jnp.max(jnp.abs(a - b)) < 1e-6
