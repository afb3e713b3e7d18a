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
    # full WORLD/SPTK + protocol coverage lives in tests/test_world.py;
    # here just the in-memory API contract
    def test_compute_mcd_contract(self, rng):
        sr = 16000
        t = np.arange(sr) / sr
        wav = 0.3 * np.sin(2 * np.pi * 150 * t) + 0.05 * np.sin(2 * np.pi * 300 * t)
        r = mcd_mod.compute_mcd(wav, wav, sr)
        assert r["mcd"] < 1e-6 and r["logf0_mean_err"] < 1e-9


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
    @staticmethod
    def _fake_run(tmp_path, rng):
        """Synthetic test dir: signals + pickled reference-shaped results."""
        import pickle

        from td_vc_gan_tpu.data.audio_io import write_audio

        sig = tmp_path / "signals"
        sig.mkdir()
        spks = ["a", "b"]
        for pid in ("p1", "p2"):
            for s in spks:
                write_audio(sig / f"{pid}-{s}-X-orig.wav",
                            rng.standard_normal(1600) * 0.1, 16000)
                for t in spks:
                    write_audio(sig / f"{pid}-{s}-{t}-conv.wav",
                                rng.standard_normal(1600) * 0.1, 16000)

        def mat(lo, hi):
            return {s: {t: list(rng.uniform(lo, hi, 2)) for t in spks} for s in spks}

        with open(tmp_path / "mcd_results", "wb") as f:
            pickle.dump({"mcd_result_conv": mat(1, 3), "mcd_result_orig": mat(1, 3),
                         "diff_f0_mean": mat(-0.3, 0.3), "diff_f0_var": mat(-1, 1),
                         "f0_ratio": mat(0.5, 2), "f0_ratio_orig": mat(0.5, 2)}, f)
        with open(tmp_path / "spkrec_results", "wb") as f:
            pickle.dump({"emb_dist": mat(0, 1), "backend": "mel_stats",
                         "test_class": {s: {t: [t, s] for t in spks} for s in spks},
                         "ref_class": {s: [s, s] for s in spks}}, f)
        return tmp_path

    def test_parallel_report(self, tmp_path, rng):
        run = self._fake_run(tmp_path, rng)
        out = report_mod.build_html_parallel(run / "index.html", run)
        text = out.read_text()
        # summary + baseline + per-pair matrices + audio grids
        assert "Mel-cepstral distortion" in text
        assert "baseline" in text.lower()
        assert "Per-transformation-pair" in text
        assert 'src="signals/p1-a-b-conv.wav"' in text
        assert "Speaker recognition correct rate" in text
        # plots rendered to disk and referenced
        assert (run / "histograms.png").exists()
        assert (run / "boxplots.png").exists()
        assert "histograms.png" in text
        # JSON sidecar carries the summary stats
        import json

        side = json.loads((run / "index.json").read_text())
        assert side["mcd_result_conv"]["n"] > 0
        assert "mcd_result_orig" in side
        assert side["speakers"] == ["a", "b"]

    def test_nonparallel_report(self, tmp_path, rng):
        run = self._fake_run(tmp_path, rng)
        out = report_mod.build_html_nonparallel(run / "index.html", run)
        text = out.read_text()
        assert "nonparallel" in text
        assert 'src="signals/p1-a-X-orig.wav"' in text

    def test_stats_exclude_self(self):
        matrix = {"a": {"a": [100.0], "b": [1.0]}, "b": {"a": [2.0], "b": [100.0]}}
        s = report_mod.dict_stats(matrix)
        assert s["mean"] == 1.5 and s["n"] == 2
        p, _ = report_mod.dict_correct_rate({"a": {"b": ["b", "a"]}})
        assert p == 0.5
