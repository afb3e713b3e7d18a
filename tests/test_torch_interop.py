"""Checkpoint-format parity: convert REAL reference state dicts and compare
forward outputs numerically.

The reference repo at /root/reference is imported (never copied) to
instantiate its torch modules; their randomly-initialized state dicts are
converted into our flax trees and both models are run on the same input.
This is the foundation of the ≤0.5 dB output-fidelity requirement.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/reference")

from model.generator import Generator as TorchGenerator  # noqa: E402
from model.discriminator import (  # noqa: E402
    CollaborativeMultibandDiscriminator as TorchCMD,
)
from model.latent_classifier import LatentClassifier as TorchLatCls  # noqa: E402

from td_vc_gan_tpu.models import (  # noqa: E402
    CollaborativeMultibandDiscriminator,
    Generator,
    LatentClassifier,
)
from td_vc_gan_tpu.training import torch_interop as ti  # noqa: E402

RATIOS = [4, 2, 2, 2]
CHANNELS = [16, 8, 8, 4, 4]
CONTENT = 6
COND = 8
NUM_SPK = 4
SEG = 1024  # content length 32 > MRF pad 25 (torch reflect-pad limit)


@pytest.fixture(scope="module")
def torch_gen():
    torch.manual_seed(0)
    g = TorchGenerator(
        RATIOS, CHANNELS[:], 0, NUM_SPK, COND, CONTENT, 3, 0, None,
        norm_layer=(None, None, None),
        weight_norm=("weight_norm", "weight_norm", "weight_norm"),
        bot_cond="target", enc_cond=None, dec_cond="target",
        output_content_emb=True,
    )
    g.eval()
    return g


@pytest.fixture(scope="module")
def jax_gen():
    return Generator(
        decoder_ratios=tuple(RATIOS),
        decoder_channels=tuple(CHANNELS),
        num_bottleneck_layers=0,
        num_classes=NUM_SPK,
        conditional_dim=COND,
        content_dim=CONTENT,
    )


class TestGeneratorParity:
    def test_state_dict_converts_and_matches_forward(self, torch_gen, jax_gen, rng):
        entries = ti.generator_entries(RATIOS, content_dim=CONTENT)
        params = ti.torch_to_flax(torch_gen.state_dict(), entries)

        # shape agreement with a fresh init
        x0 = jnp.zeros((1, SEG, 1))
        c0 = jax.nn.one_hot(jnp.array([0]), NUM_SPK)
        ref_params = jax_gen.init(jax.random.PRNGKey(0), x0, c0, None, jnp.zeros((1, SEG, 1)))
        assert jax.tree.map(jnp.shape, params) == jax.tree.map(jnp.shape, ref_params)

        x = rng.standard_normal((2, SEG)).astype(np.float32) * 0.3
        exc = rng.standard_normal((2, SEG)).astype(np.float32) * 0.1
        labels = np.array([1, 3])
        onehot = np.eye(NUM_SPK, dtype=np.float32)[labels]

        with torch.no_grad():
            wav_t, subs_t = torch_gen(
                torch.from_numpy(x[:, None, :]),
                torch.from_numpy(onehot),
                c_var=torch.from_numpy(exc[:, None, :]),
                out_subsample=True,
            )
            cont_t = torch_gen.content_embedding

        wav_j, subs_j, cont_j = jax_gen.apply(
            params, jnp.asarray(x[..., None]), jnp.asarray(onehot), None,
            jnp.asarray(exc[..., None]),
        )

        np.testing.assert_allclose(
            np.asarray(cont_j).transpose(0, 2, 1), cont_t.numpy(), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(wav_j)[..., 0], wav_t.numpy()[:, 0, :], atol=1e-4
        )
        assert len(subs_j) == len(subs_t)
        for sj, st in zip(subs_j, subs_t):
            np.testing.assert_allclose(
                np.asarray(sj)[..., 0], st.numpy()[:, 0, :], atol=1e-4
            )

    def test_roundtrip_loads_into_reference_strict(self, torch_gen):
        entries = ti.generator_entries(RATIOS, content_dim=CONTENT)
        params = ti.torch_to_flax(torch_gen.state_dict(), entries)
        sd = ti.flax_to_torch(params, entries)
        sd_t = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
        # strict load proves exact key coverage (non-buffer keys)
        missing, unexpected = torch_gen.load_state_dict(sd_t, strict=False)
        assert unexpected == []
        assert missing == []


class TestDiscriminatorParity:
    def test_forward_matches(self, rng):
        torch.manual_seed(1)
        d_t = TorchCMD(3, NUM_SPK, 4, 4)
        d_t.eval()
        entries = ti.discriminator_entries(3, 4)
        params = ti.torch_to_flax(d_t.state_dict(), entries)
        d_j = CollaborativeMultibandDiscriminator(
            num_disc=3, num_classes=NUM_SPK, num_layers=4, num_channels_base=4
        )

        x = rng.standard_normal((2, 640)).astype(np.float32) * 0.3
        labels = np.array([0, 2])
        with torch.no_grad():
            xt = torch.from_numpy(x[:, None, :])
            subs_t = d_t.get_subsamples(xt)
            outs_t, feats_t = d_t(xt, torch.from_numpy(labels), subs_t)

        xj = jnp.asarray(x[..., None])
        subs_j = CollaborativeMultibandDiscriminator.get_subsamples(xj, 3)
        for sj, st in zip(subs_j, subs_t):
            np.testing.assert_allclose(np.asarray(sj)[..., 0], st.numpy()[:, 0, :], atol=1e-5)

        outs_j, feats_j = d_j.apply(params, xj, jnp.asarray(labels), subs_j)
        assert len(outs_j) == len(outs_t) == 5
        for oj, ot in zip(outs_j, outs_t):
            np.testing.assert_allclose(
                np.asarray(oj)[..., 0], ot.numpy()[:, 0, :], atol=2e-4
            )
        for fj, ft in zip(feats_j, feats_t):
            assert len(fj) == len(ft)
            np.testing.assert_allclose(
                np.asarray(fj[-1]).transpose(0, 2, 1), ft[-1].numpy(), atol=2e-4
            )


class TestLatentClassifierParity:
    def test_forward_matches(self, rng):
        torch.manual_seed(2)
        c_t = TorchLatCls(NUM_SPK, CONTENT)
        c_t.eval()
        entries = ti.latent_classifier_entries(3)
        params = ti.torch_to_flax(c_t.state_dict(), entries)
        c_j = LatentClassifier(num_classes=NUM_SPK)

        x = rng.standard_normal((2, 40, CONTENT)).astype(np.float32)
        with torch.no_grad():
            out_t = c_t(torch.from_numpy(x.transpose(0, 2, 1)))
        out_j = c_j.apply(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=2e-5)


class TestMultiscaleDiscriminatorParity:
    def test_forward_matches(self, rng):
        """AvgPool-cascade multiscale D vs the reference torch module
        (model/discriminator.py:55-75) — round-1 VERDICT weak #6."""
        from model.discriminator import MultiscaleDiscriminator as TorchMSD

        from td_vc_gan_tpu.models.discriminator import MultiscaleDiscriminator

        torch.manual_seed(3)
        d_t = TorchMSD(3, NUM_SPK, 4, 4)
        d_t.eval()
        params = ti.torch_to_flax(d_t.state_dict(), ti.discriminator_entries(3, 4))
        d_j = MultiscaleDiscriminator(
            num_disc=3, num_classes=NUM_SPK, num_layers=4, num_channels_base=4
        )

        x = rng.standard_normal((2, 640)).astype(np.float32) * 0.3
        labels = np.array([1, 3])
        with torch.no_grad():
            outs_t, feats_t = d_t(torch.from_numpy(x[:, None, :]), torch.from_numpy(labels))
        outs_j, feats_j = d_j.apply(params, jnp.asarray(x[..., None]), jnp.asarray(labels))
        assert len(outs_j) == len(outs_t) == 3
        for oj, ot in zip(outs_j, outs_t):
            np.testing.assert_allclose(
                np.asarray(oj)[..., 0], ot.numpy()[:, 0, :], atol=2e-4
            )
        for fj, ft in zip(feats_j, feats_t):
            assert len(fj) == len(ft)
            for a, b in zip(fj, ft):
                np.testing.assert_allclose(
                    np.asarray(a).transpose(0, 2, 1), b.numpy(), atol=2e-4
                )
