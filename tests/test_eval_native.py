"""Tests for the native DSP library and the evaluation harness."""

import numpy as np
import pytest
import scipy.signal as sps

from td_vc_gan_tpu import native
from td_vc_gan_tpu.data.corruption import EQ_CENTERS, params2sos
from td_vc_gan_tpu.eval import mcd as mcd_mod
from td_vc_gan_tpu.eval import report as report_mod
from td_vc_gan_tpu.eval import speaker_rec
from td_vc_gan_tpu.eval.asr import cer, wer


class TestNative:
    def test_sosfilt_matches_scipy(self, rng):
        x = rng.standard_normal(4000)
        sos = params2sos(rng.uniform(-12, 12, 10), EQ_CENTERS,
                         2 * 2.5 ** rng.uniform(0, 1, 10), 16000)
        np.testing.assert_allclose(native.sosfilt(sos, x), sps.sosfilt(sos, x), atol=1e-10)

    def test_dtw_native_matches_numpy(self, rng):
        d = rng.random((30, 45)).astype(np.float32)
        c1, p1 = native.dtw(d)
        c2, p2 = native._dtw_numpy(d)
        assert abs(c1 - c2) < 1e-4
        assert len(p1) == len(p2)
        # path is monotone and spans corners
        assert tuple(p1[0]) == (0, 0) and tuple(p1[-1]) == (29, 44)
        assert (np.diff(p1, axis=0) >= 0).all()

    def test_dtw_identity_is_diagonal(self):
        n = 20
        d = 1.0 - np.eye(n, dtype=np.float32)
        cost, path = native.dtw(d)
        assert cost < 1e-6
        np.testing.assert_array_equal(path, np.stack([np.arange(n)] * 2, -1))

    def test_psola_ola_reconstructs_energy(self, rng):
        wav = np.sin(2 * np.pi * 100 * np.arange(3200) / 16000).astype(np.float32)
        ana = np.arange(80, 3120, 160)
        out, norm = native.psola_ola(wav, ana, ana, np.full(len(ana), 160, np.int32), 3200)
        recon = out[400:2800] / np.maximum(norm[400:2800], 1e-3)
        np.testing.assert_allclose(recon, wav[400:2800], atol=0.05)


class TestMcd:
    def test_identical_signals_near_zero(self, rng):
        sr = 16000
        t = np.arange(sr) / sr
        wav = (0.3 * np.sin(2 * np.pi * 150 * t) * (1 + 0.5 * np.sin(2 * np.pi * 2 * t)))
        r = mcd_mod.compute_mcd(wav, wav, sr)
        assert r["mcd"] < 1e-4
        assert r["logf0_mean_err"] < 1e-9

    def test_different_spectra_positive(self, rng):
        sr = 16000
        t = np.arange(sr) / sr
        a = 0.3 * np.sin(2 * np.pi * 150 * t)
        b = 0.3 * np.sin(2 * np.pi * 260 * t)
        r = mcd_mod.compute_mcd(a, b, sr)
        assert r["mcd"] > 1.0
        assert r["f0_ratio"] < 1.0  # conv lower-pitched than target

    def test_mel_cepstra_shape(self, rng):
        mc = mcd_mod.mel_cepstra(rng.standard_normal(8000), 16000)
        assert mc.shape[1] == 24


class TestSpeakerRec:
    def test_same_speaker_more_similar(self, rng):
        sr = 16000
        t = np.arange(2 * sr) / sr

        def voice(f0, formant):
            sig = np.zeros_like(t)
            for h in range(1, 10):
                sig += np.exp(-0.5 * ((h * f0 - formant) / 300) ** 2) * np.sin(
                    2 * np.pi * h * f0 * t
                )
            return 0.1 * sig + 0.001 * rng.standard_normal(len(t))

        spk_a = [(voice(110, 500), "a"), (voice(115, 520), "a")]
        spk_b = [(voice(220, 1500), "b"), (voice(210, 1400), "b")]
        conv = [(voice(112, 510), "a"), (voice(215, 1450), "b")]
        res = speaker_rec.evaluate(conv, spk_a + spk_b)
        assert res["accuracy"] == 1.0
        assert res["mean_similarity"] > 0.5


class TestAsrMetrics:
    def test_wer_cer(self):
        assert wer("the cat sat", "the cat sat") == 0.0
        assert wer("the cat sat", "the dog sat") == pytest.approx(1 / 3)
        assert cer("abc", "axc") == pytest.approx(1 / 3)


class TestReport:
    def test_builds_html_and_json(self, tmp_path, rng):
        from td_vc_gan_tpu.data.audio_io import write_audio

        write_audio(tmp_path / "p1-a-b-conv.wav", rng.standard_normal(1600) * 0.1, 16000)
        write_audio(tmp_path / "p1-a-X-orig.wav", rng.standard_normal(1600) * 0.1, 16000)
        out = report_mod.build_report(
            tmp_path / "index.html", tmp_path,
            {"p1-a-b-conv.wav": {"mcd": 5.0, "logf0_mean_err": 0.1}},
            {"backend": "mel_stats", "mean_similarity": 0.7, "accuracy": 0.5},
            {"available": False},
        )
        text = out.read_text()
        assert "Mel-cepstral" in text and "audio" in text
        assert (tmp_path / "index.json").exists()
