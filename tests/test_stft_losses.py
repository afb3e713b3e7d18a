"""Tests for STFT/mel ops and the loss suite."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from td_vc_gan_tpu.ops import losses, stft


class TestStft:
    def test_hann_matches_torch(self):
        np.testing.assert_allclose(
            stft.hann_window(1024), torch.hann_window(1024).numpy(), atol=1e-6
        )

    def test_frame_count_matches_torch_stft(self, rng):
        x = rng.standard_normal((2, 8960)).astype(np.float32)
        for n_fft in (2048, 1024, 512):
            p = stft.stft_power(jnp.asarray(x), n_fft, n_fft // 4)
            ref = torch.stft(
                torch.from_numpy(x),
                n_fft,
                hop_length=n_fft // 4,
                window=torch.hann_window(n_fft),
                center=True,
                pad_mode="reflect",
                return_complex=True,
            )
            assert p.shape == (2, ref.shape[-1], n_fft // 2 + 1)
            np.testing.assert_allclose(
                np.asarray(p),
                (ref.abs() ** 2).transpose(1, 2).numpy(),
                atol=2e-2,
                rtol=1e-4,
            )

    def test_mel_filterbank_properties(self):
        fb = stft.mel_filterbank(16000, 2048, 80)
        assert fb.shape == (1025, 80)
        assert (fb >= 0).all()
        # every filter has support; slaney normalization keeps area ~2/bandwidth
        assert (fb.sum(0) > 0).all()

    def test_melspectrogram_shape(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 8960)).astype(np.float32))
        m = stft.melspectrogram(x, 16000, 2048, 80)
        assert m.shape == (2, 8960 // 512 + 1, 80)
        assert np.isfinite(np.asarray(m)).all()


class TestGanLosses:
    def test_lsgan_values(self):
        real = [jnp.ones((2, 5)), jnp.full((2, 3), 0.5)]
        fake = [jnp.zeros((2, 5)), jnp.full((2, 3), 0.5)]
        lr, lf, _, _ = losses.lsgan_d_loss(real, fake)
        np.testing.assert_allclose(float(lr), 0.25)
        np.testing.assert_allclose(float(lf), 0.25)
        lg, per = losses.lsgan_g_loss(fake)
        np.testing.assert_allclose(float(lg), 1.25)
        assert len(per) == 2

    def test_feat_loss_zero_on_identical(self, rng):
        feats = [[jnp.asarray(rng.standard_normal((2, 10, 4)).astype(np.float32))] * 2]
        assert float(losses.multiscale_feat_loss(feats, feats)) == 0.0

    def test_feat_loss_no_grad_to_ref(self, rng):
        a = jnp.asarray(rng.standard_normal((2, 6, 3)).astype(np.float32))

        def f(x):
            return losses.multiscale_feat_loss([[x]], [[x * 2.0]])

        g = jax.grad(f)(a)
        # grad flows only through the first (sig) argument; finite and nonzero
        assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).max() > 0

    def test_spec_loss_zero_on_identical(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 5120)).astype(np.float32))
        assert float(losses.multiscale_spec_loss(x, x, (512,))) < 1e-6

    def test_spec_loss_positive_and_differentiable(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 5120)).astype(np.float32))
        y = jnp.asarray(rng.standard_normal((1, 5120)).astype(np.float32))

        val, g = jax.value_and_grad(lambda a: losses.multiscale_spec_loss(a, y, (512,)))(x)
        assert float(val) > 0
        assert np.isfinite(np.asarray(g)).all()


class TestContrastive:
    def test_perfect_alignment_low_loss(self, rng):
        # identical embeddings: positive cosine sim = 1, negatives < 1 a.s.
        x = jnp.asarray(rng.standard_normal((2, 30, 16)).astype(np.float32))
        loss_same = losses.contrastive_loss(x, x, jax.random.PRNGKey(0))
        y = jnp.asarray(rng.standard_normal((2, 30, 16)).astype(np.float32))
        loss_diff = losses.contrastive_loss(x, y, jax.random.PRNGKey(0))
        assert float(loss_same) < float(loss_diff)

    def test_matches_torch_reference_impl(self, rng):
        """Check logits math (not sampling) against a torch replica of
        util/losses.py:94-116 with identical negatives."""
        b, t, c, n = 1, 12, 8, 5
        x = rng.standard_normal((b, t, c)).astype(np.float32)
        y = rng.standard_normal((b, t, c)).astype(np.float32)
        negs = rng.standard_normal((b, t, n, c)).astype(np.float32)

        ours = losses._cosine_logits(jnp.asarray(x), jnp.asarray(y), jnp.asarray(negs), 0.1)

        xt = torch.from_numpy(x).transpose(1, 2)  # BxCxT
        yt = torch.from_numpy(y).transpose(1, 2)
        negs_t = torch.from_numpy(negs).permute(0, 3, 1, 2)  # BxCxTxN
        targets = torch.cat([yt.unsqueeze(-1), negs_t], dim=-1)
        ref = torch.nn.functional.cosine_similarity(xt.unsqueeze(-1), targets, dim=1) / 0.1
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-4)

    def test_gradients_finite(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 20, 8)).astype(np.float32))
        y = jnp.asarray(rng.standard_normal((2, 20, 8)).astype(np.float32))
        g = jax.grad(lambda a: losses.contrastive_loss(a, y, jax.random.PRNGKey(3)))(x)
        assert np.isfinite(np.asarray(g)).all()


class TestCrossEntropy:
    def test_matches_torch(self, rng):
        logits = rng.standard_normal((4, 10)).astype(np.float32)
        labels = np.array([0, 3, 9, 2])
        ours = float(losses.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
        ref = float(
            torch.nn.functional.cross_entropy(torch.from_numpy(logits), torch.from_numpy(labels))
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-5)
