"""Golden-value tests for the DSP ops vs the reference's formulas.

Where the reference semantics come from torch primitives (interpolate, roll,
kaiser windows), we check directly against torch-CPU, which is available in
the test image.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from td_vc_gan_tpu.ops import dsp
from td_vc_gan_tpu.ops import yin as jyin


class TestKaiserFilters:
    def test_kaiser_filter_matches_reference_formula(self):
        # reference: util/__init__.py:104-113
        import math

        for L, w in [(160, 1 / 10), (32, 1 / 2), (128, 1 / 8)]:
            f = dsp.kaiser_filter(L, w)
            n = torch.arange(-(L // 2), L // 2 + 1).float()
            ref = torch.sin(math.pi * w * n) / (math.pi * n + 1e-8)
            ref[n.shape[0] // 2] = w
            ref = ref * torch.kaiser_window(L + 1, False, 2.5)
            ref = ref / torch.sum(ref)
            np.testing.assert_allclose(f, ref.numpy(), atol=1e-6)

    def test_kaiser_filter_fc_matches_reference_formula(self):
        # reference: util/dsp.py:5-16
        import math

        for L, fc, beta in [(129, 0.5, 10.0), (65, 0.25, 2.5)]:
            f = dsp.kaiser_filter_fc(L, fc, beta)
            Lm = L - 1
            n = torch.arange(-(Lm // 2), Lm // 2 + 1).float()
            ref = torch.sin(math.pi * fc * n) / (math.pi * n + 1e-8)
            ref[n.shape[0] // 2] = fc
            ref = ref * torch.kaiser_window(Lm + 1, False, beta)
            ref = ref / torch.sum(ref)
            np.testing.assert_allclose(f, ref.numpy(), atol=1e-6)

    def test_even_length_fc_filter_rejected(self):
        with pytest.raises(ValueError):
            dsp.kaiser_filter_fc(128, 0.5)


class TestLinearUpsample:
    def test_matches_torch_interpolate(self, rng):
        x = rng.standard_normal((2, 17)).astype(np.float32)
        for scale in (4, 64):
            ours, _, _ = dsp._linear_upsample(jnp.asarray(x), scale)
            theirs = F.interpolate(
                torch.from_numpy(x)[:, None, :], scale_factor=scale, mode="linear"
            )[:, 0, :]
            np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-5)


class TestExcitation:
    def test_shapes_and_voiced_unvoiced_structure(self):
        key = jax.random.PRNGKey(0)
        f0 = jnp.zeros((2, 11)).at[:, 3:8].set(220.0)
        exc = dsp.f0_to_excitation(f0, 64, key, sampling_rate=16000)
        assert exc.shape == (2, 10 * 64)
        exc = np.asarray(exc)
        # Unvoiced spans are pure noise with std 0.1/3 (gain trick at
        # util/__init__.py:26-27); voiced spans carry the 0.1-amplitude sine.
        unvoiced_std = exc[:, : 2 * 64].std()
        assert 0.015 < unvoiced_std < 0.05
        voiced_rms = np.sqrt((exc[:, 4 * 64 : 7 * 64] ** 2).mean())
        assert 0.05 < voiced_rms < 0.09  # ~0.1/sqrt(2)

    def test_fully_unvoiced_is_noise(self):
        key = jax.random.PRNGKey(1)
        exc = dsp.f0_to_excitation(jnp.zeros((1, 9)), 64, key)
        assert np.abs(np.asarray(exc)).max() < 0.5
        assert np.asarray(exc).std() > 0.01

    def test_voiced_region_is_periodic(self):
        key = jax.random.PRNGKey(2)
        f0 = jnp.full((1, 41), 250.0)
        exc = np.asarray(dsp.f0_to_excitation(f0, 64, key))[0]
        spec = np.abs(np.fft.rfft(exc * np.hanning(len(exc))))
        freqs = np.fft.rfftfreq(len(exc), 1 / 16000)
        assert abs(freqs[spec.argmax()] - 250.0) < 10.0


class TestRollBatches:
    def test_matches_per_element_torch_roll(self, rng):
        x = rng.standard_normal((3, 4, 10)).astype(np.float32)
        shifts = np.array([1, -2, 5])
        ours = np.asarray(dsp.roll_batches(jnp.asarray(x), jnp.asarray(shifts), 2))
        for b in range(3):
            ref = torch.roll(torch.from_numpy(x[b]), int(shifts[b]), dims=-1)
            np.testing.assert_allclose(ours[b], ref.numpy())

    def test_roll_axis1(self, rng):
        x = rng.standard_normal((2, 8, 3)).astype(np.float32)
        shifts = np.array([2, -1])
        ours = np.asarray(dsp.roll_batches(jnp.asarray(x), jnp.asarray(shifts), 1))
        for b in range(2):
            ref = np.roll(x[b], int(shifts[b]), axis=0)
            np.testing.assert_allclose(ours[b], ref)


class TestJitterAndRms:
    def test_add_jitter_is_circular_shift(self):
        x = jnp.arange(24.0).reshape(2, 12)
        out = dsp.add_jitter(x, 3, jax.random.PRNGKey(0))
        assert out.shape == x.shape
        # circular shift preserves the multiset of values per row
        np.testing.assert_allclose(np.sort(np.asarray(out), -1), np.asarray(x))

    def test_eq_rms(self, rng):
        sig = rng.standard_normal(1000)
        out = dsp.eq_rms(sig, -30.0)
        rms = np.sqrt((out**2).mean())
        np.testing.assert_allclose(20 * np.log10(rms), -30.0, atol=1e-6)

    def test_eq_rms_signals(self, rng):
        a, b = rng.standard_normal(500), 0.01 * rng.standard_normal(500)
        out = dsp.eq_rms_signals(a, b)
        np.testing.assert_allclose(
            np.sqrt((out**2).mean()), np.sqrt((b**2).mean()), rtol=1e-5
        )


class TestYin:
    def test_sine_pitch(self):
        sr = 16000
        t = np.arange(sr // 2) / sr
        for f in (110.0, 220.0, 330.0):
            sig = jnp.asarray(np.sin(2 * np.pi * f * t).astype(np.float32))[None]
            f0 = np.asarray(
                jyin.estimate(sig, sr, pitch_min=60, pitch_max=500, frame_stride=64 / sr)
            )
            voiced = f0[f0 > 0]
            assert voiced.size > 0.8 * f0.size
            np.testing.assert_allclose(np.median(voiced), f, rtol=0.03)

    def test_noise_is_unvoiced(self, rng):
        sig = jnp.asarray(rng.standard_normal((1, 8000)).astype(np.float32))
        f0 = np.asarray(jyin.estimate(sig, 16000, pitch_min=60, pitch_max=500, frame_stride=0.004))
        assert (f0 == 0).mean() > 0.5

    def test_soft_search_is_differentiable(self):
        sr = 16000
        t = np.arange(4000) / sr
        sig = jnp.asarray(np.sin(2 * np.pi * 200 * t).astype(np.float32))[None]

        def mean_f0(s):
            return jnp.mean(jyin.estimate(s, sr, pitch_min=60, pitch_max=500, soft=True))

        g = jax.grad(mean_f0)(sig)
        assert np.isfinite(np.asarray(g)).all()


class TestRollBatchesLongAxis:
    """The n>512 scan/dynamic-slice branch — the one add_jitter exercises on
    real 8960-sample training signals (round-2 review finding)."""

    def test_matches_mod_gather(self):
        import numpy as np

        from td_vc_gan_tpu.ops import dsp

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((3, 600)).astype(np.float32))
        shifts = jnp.asarray([5, -7, 0], jnp.int32)
        got = dsp.roll_batches(x, shifts, axis=1)
        idx = (jnp.arange(600)[None, :] - shifts[:, None]) % 600
        ref = jnp.take_along_axis(x, idx, axis=1)
        assert jnp.array_equal(got, ref)

    def test_negative_axis(self):
        import numpy as np

        from td_vc_gan_tpu.ops import dsp

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((2, 4, 600)).astype(np.float32))
        shifts = jnp.asarray([3, -2], jnp.int32)
        assert jnp.array_equal(
            dsp.roll_batches(x, shifts, axis=-1),
            dsp.roll_batches(x, shifts, axis=2),
        )
