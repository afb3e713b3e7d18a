"""Tests for the lightweight CLI tools (manifest prep, subsets, diagnostics)."""

import json
import pickle

import numpy as np
import pytest

from td_vc_gan_tpu.cli import get_model_info, merge_datasets, prepare_dataset, subset_dataset
from td_vc_gan_tpu.data.audio_io import write_audio
from td_vc_gan_tpu.eval import mosnet


def make_tree(tmp_path, n_spk=3, n_utt=12):
    root = tmp_path / "raw"
    for s in range(n_spk):
        d = root / f"spk{s}"
        d.mkdir(parents=True)
        for u in range(n_utt):
            write_audio(d / f"u{u}.wav", np.zeros(1600), 16000)
    return root


class TestPrepareDataset:
    def test_manifests_and_speakers(self, tmp_path):
        root = make_tree(tmp_path)
        out = tmp_path / "ds"
        prepare_dataset.main([str(root), "--save_folder", str(out),
                              "--test_size", "2", "--ext", ".wav"])
        train = (out / "train_files").read_text().strip().splitlines()
        test = (out / "test_files").read_text().strip().splitlines()
        # split happens only when len(files) > 5*test_size (ref behavior)
        assert len(train) == 3 * 10 and len(test) == 3 * 2
        with open(out / "speakers", "rb") as f:
            spk = pickle.load(f)
        assert spk == {"spk0": 0, "spk1": 1, "spk2": 2}

    def test_out_of_sample_holdout(self, tmp_path):
        root = make_tree(tmp_path)
        out = tmp_path / "ds2"
        prepare_dataset.main([str(root), "--save_folder", str(out),
                              "--out_of_sample_speakers", "1", "--ext", ".wav"])
        with open(out / "speakers", "rb") as f:
            spk = pickle.load(f)
        assert len(spk) == 2
        assert (out / "test_oos_files").exists()


class TestMergeAndSubset:
    def test_merge_reoffsets_speakers(self, tmp_path):
        for name, spks in (("a", ["x", "y"]), ("b", ["z"])):
            d = tmp_path / name
            d.mkdir()
            (d / "train_files").write_text(f"/p/{name}.wav|{spks[0]}\n")
            (d / "test_files").write_text("")
            with open(d / "speakers", "wb") as f:
                pickle.dump({s: i for i, s in enumerate(spks)}, f)
        merge_datasets.main(["a", "b", "merged", "--root_folder", str(tmp_path)])
        with open(tmp_path / "merged" / "speakers", "rb") as f:
            spk = pickle.load(f)
        assert spk == {"x": 0, "y": 1, "z": 2}

    def test_subset(self, tmp_path):
        root = make_tree(tmp_path)
        out = tmp_path / "full"
        prepare_dataset.main([str(root), "--save_folder", str(out),
                              "--test_size", "2", "--ext", ".wav"])
        sub = tmp_path / "sub"
        subset_dataset.main([str(out), str(sub), "--num_speakers", "2",
                             "--utts_per_speaker", "1"])
        lines = (sub / "test_files").read_text().strip().splitlines()
        assert len(lines) == 2


class TestModelInfo:
    def test_estimates_from_mtimes(self, tmp_path):
        import os
        import time

        now = time.time()
        for e in range(0, 15, 5):
            p = tmp_path / f"step{e}-G.pt"
            p.write_bytes(b"")
            os.utime(p, (now + e * 60, now + e * 60))
        info = get_model_info.estimate_train_time(tmp_path)
        assert info["checkpoints"] == 3
        assert abs(info["seconds_per_epoch"] - 60) < 1


class TestMosnetHook:
    def test_unavailable_without_command(self, tmp_path):
        assert mosnet.predict_mos(tmp_path)["available"] is False

    def test_json_and_line_parsing(self, tmp_path):
        # JSON braces would collide with the {dir} format placeholder, so the
        # predictor output comes from a file (as a real external tool would)
        scores = tmp_path / "scores.json"
        scores.write_text(json.dumps({"a.wav": 3.5, "b.wav": 4.0}))
        res = mosnet.predict_mos(tmp_path, command=f"cat {scores} # {{dir}}")
        assert res["available"] and abs(res["mean_mos"] - 3.75) < 1e-9
        res2 = mosnet.predict_mos(tmp_path, command="printf 'a.wav 3.0\\nb.wav 5.0\\n' # {dir}")
        assert abs(res2["mean_mos"] - 4.0) < 1e-9


class TestParseRegex:
    def test_vctk_style_regex(self):
        """--parse_regex handles wavs named by the reference's per-dataset
        scripts (vctk sig ids contain '_', test_scripts/vctk/test_gen_html.py)."""
        from td_vc_gan_tpu.cli.run_test import make_parse_fn

        parse = make_parse_fn(r"(p\d+_\d+)-(p\d+)-(p\d+|X)-(orig|conv)\.wav")
        assert parse("p225_001-p225-p226-conv.wav") == (
            "p225_001", "p225", "p226", "conv")
        assert parse("p225_001-p225-X-orig.wav") == ("p225_001", "p225", "X", "orig")
        assert parse("not-a-match.txt") is None

    def test_wrong_group_count_rejected(self):
        import pytest

        from td_vc_gan_tpu.cli.run_test import make_parse_fn

        with pytest.raises(ValueError, match="4 capture groups"):
            make_parse_fn(r"(\S+)-(\S+)\.wav")


class TestRunTest:
    def test_skip_generate_full_chain(self, tmp_path, rng):
        """run_test over a pre-generated signals dir: MCD protocol + speaker
        rec + report, no model needed (--skip_generate)."""
        import json

        import numpy as np

        from td_vc_gan_tpu.cli import run_test
        from td_vc_gan_tpu.data.audio_io import write_audio

        sig = tmp_path / "signals"
        sig.mkdir(parents=True)
        sr = 16000
        t = np.arange(sr // 2) / sr

        def voice(f0, seed):
            r = np.random.default_rng(seed)
            w = sum((0.2 + np.exp(-0.5 * ((h * f0 - 700) / 400) ** 2))
                    * np.sin(2 * np.pi * h * f0 * t) for h in range(1, 6))
            return 0.15 * w + 0.005 * r.standard_normal(len(t))

        voices = {"s1": 130.0, "s2": 240.0}
        for pid in ("001", "002"):
            for spk, f0 in voices.items():
                write_audio(sig / f"{pid}-{spk}-X-orig.wav", voice(f0, hash(pid) % 50), sr)
                for tgt, tf0 in voices.items():
                    write_audio(sig / f"{pid}-{spk}-{tgt}-conv.wav",
                                voice(tf0 * 0.98, hash(pid + spk) % 50), sr)

        run_test.main([
            "--save_path", str(tmp_path), "--load_path", str(tmp_path),
            "--data_path", str(tmp_path), "--skip_generate",
        ])
        assert (tmp_path / "mcd_results").exists()
        assert (tmp_path / "spkrec_results").exists()
        text = (tmp_path / "index.html").read_text()
        assert "baseline" in text.lower() and "signals/001-s1-s2-conv.wav" in text
        side = json.loads((tmp_path / "index.json").read_text())
        assert np.isfinite(side["mcd_result_conv"]["mean"])
        assert np.isfinite(side["mcd_result_orig"]["mean"])


class TestForeignNamingEnumeration:
    """The eval harness must FIND files under a custom --parse_regex whose
    naming differs from this build's default — enumeration is field-based
    (eval/mcd.scan_wavs), not filename reconstruction."""

    def _foreign_dir(self, tmp_path, rng):
        from td_vc_gan_tpu.data.audio_io import write_audio

        d = tmp_path / "foreign"
        d.mkdir()
        t = np.arange(16000) / 16000
        for name, f in [
            ("utt1_a_to_none_src.wav", 150), ("utt1_b_to_none_src.wav", 210),
            ("utt1_a_to_b_gen.wav", 200), ("unrelated_readme.wav", 100),
        ]:
            sig = 0.2 * np.sin(2 * np.pi * f * t) + 0.01 * rng.standard_normal(t.size)
            write_audio(d / name, sig, 16000)
        return d

    def test_scan_and_mcd_with_custom_regex(self, tmp_path, rng):
        from td_vc_gan_tpu.cli.run_test import make_parse_fn
        from td_vc_gan_tpu.eval import mcd as mcd_mod

        # the REAL CLI path: --parse_regex + --parse_kind_map (a pure regex
        # cannot rename its kind group to orig/conv)
        parse = make_parse_fn(r"(utt\d+)_(\w)_to_(\w+)_(src|gen)\.wav",
                              "src=orig,gen=conv")

        d = self._foreign_dir(tmp_path, rng)
        origs, convs = mcd_mod.scan_wavs(d, parse)
        assert set(origs) == {("utt1", "a"), ("utt1", "b")}
        assert set(convs) == {("utt1", "a", "b")}  # unrelated_readme skipped

        res = mcd_mod.test_mcd(None, d, parse=parse)
        assert res["mcd_result_conv"]["a"]["b"], "conv pair not scored"
        assert res["mcd_result_orig"]["a"]["b"], "orig baseline not scored"

    def test_kind_map_validation(self):
        import pytest

        from td_vc_gan_tpu.cli.run_test import make_parse_fn

        with pytest.raises(ValueError, match="orig or conv"):
            make_parse_fn(r"(a)(b)(c)(d)", "src=original")
        with pytest.raises(ValueError, match="4 capture groups"):
            make_parse_fn(r"(a)(b)(c)")

    def test_report_builders_with_foreign_naming(self, tmp_path, rng):
        """The HTML report must FIND foreign-named wavs (field-based
        enumeration) — the old glob produced a silently empty report."""
        from td_vc_gan_tpu.cli.run_test import make_parse_fn
        from td_vc_gan_tpu.eval import report as report_mod

        parse = make_parse_fn(r"(utt\d+)_(\w)_to_(\w+)_(src|gen)\.wav",
                              "src=orig,gen=conv")
        d = self._foreign_dir(tmp_path, rng)
        results = {"mcd_result_conv": {"a": {"b": [1.0]}},
                   "emb_dist": {}, "test_class": {}}

        out = report_mod.build_html_parallel(
            tmp_path / "index.html", d, parse=parse, results=results)
        html_text = out.read_text()
        assert "utt1_a_to_b_gen.wav" in html_text, "conv audio not embedded"
        assert "utt1_a_to_none_src.wav" in html_text, "orig audio not embedded"
        import json

        side = json.loads((tmp_path / "index.json").read_text())
        assert side["phrases"] == ["utt1"] and side["speakers"] == ["a", "b"]

        out2 = report_mod.build_html_nonparallel(
            tmp_path / "np.html", d, parse=parse, results=results)
        t2 = out2.read_text()
        assert "utt1_a_to_b_gen.wav" in t2 and "utt1_b_to_none_src.wav" in t2


def make_run_dir(tmp_path):
    """Fabricate a tiny run dir (config.yaml + exported torch checkpoint)."""
    import jax
    import jax.numpy as jnp

    from td_vc_gan_tpu.config import Config
    from td_vc_gan_tpu.models import (
        CollaborativeMultibandDiscriminator,
        LatentClassifier,
    )
    from td_vc_gan_tpu.models import crepe as crepe_mod
    from td_vc_gan_tpu.models.generator import generator_from_config
    from td_vc_gan_tpu.training import checkpoint as ckpt_mod
    from td_vc_gan_tpu.training import state as state_mod

    cfg = Config()
    g = cfg.model.generator
    g.decoder_ratios = [10, 4, 2, 2]
    g.decoder_channels = [16, 16, 8, 8, 4]
    g.content_dim = 8
    g.conditional_dim = 8
    g.num_enc_layers = 2
    g.mrf_kernel_sizes = [3]
    g.mrf_dilations = [1, 3]
    cfg.model.discriminator.num_channels_base = 4
    cfg.train.max_segment = 3200
    cfg.train.mel_fft_sizes = [512]
    num_spk = 2

    G = generator_from_config(g, num_spk)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 3200, 1))
    onehot = jax.nn.one_hot(jnp.zeros((1,), jnp.int32), num_spk)
    pg = jax.jit(G.init)(key, x, onehot, None, x)
    dc = cfg.model.discriminator
    D = CollaborativeMultibandDiscriminator(
        num_disc=dc.num_disc, num_classes=num_spk,
        num_layers=dc.num_layers, num_channels_base=dc.num_channels_base)
    pd = jax.jit(D.init)(key, x, jnp.zeros((1,), jnp.int32),
                         D.get_subsamples(x, dc.num_disc))
    C = LatentClassifier(num_classes=num_spk)
    pc = jax.jit(C.init)(key, jnp.zeros((1, 10, g.content_dim)))
    crepe_params = jax.jit(crepe_mod.init_crepe)(key)
    state, _ = state_mod.create_train_state(cfg, pg, pd, pc, crepe_params)

    run = tmp_path / "run"
    run.mkdir()
    cfg.save(run / "config.yaml")
    ckpt_mod.export_torch(jax.device_get(state), cfg, run, 0)
    return run


class TestGenerateCLIs:
    """End-to-end drive of the conversion entry points over a fabricated run
    dir (config.yaml + exported torch checkpoint): the argparse/IO layer
    above the tested Converter was previously uncovered."""

    @pytest.fixture()
    def run_dir(self, tmp_path):
        return make_run_dir(tmp_path)

    @pytest.fixture()
    def corpus(self, tmp_path):
        import pickle

        from td_vc_gan_tpu.data import audio_io

        root = tmp_path / "corpus"
        root.mkdir()
        rng = np.random.default_rng(0)
        entries = []
        for spk in range(2):
            d = root / f"spk{spk}"
            d.mkdir()
            t = np.arange(4000) / 16000
            sig = 0.25 * np.sin(2 * np.pi * (130 + 60 * spk) * t) * (
                1 + 0.05 * rng.standard_normal(t.size))
            path = d / f"utt{spk}.wav"
            audio_io.write_audio(path, sig, 16000)
            entries.append(f"{path}|spk{spk}")
        (root / "test_files").write_text("\n".join(entries) + "\n")
        with open(root / "speakers", "wb") as f:
            pickle.dump([("spk0", 0), ("spk1", 1)], f)
        # pairs manifest for generate_from_list
        (root / "pairs").write_text(
            f"c0|{entries[0].split('|')[0]}|{entries[1].split('|')[0]}\n")
        return root

    def test_generate_with_target(self, run_dir, corpus, tmp_path):
        from td_vc_gan_tpu.cli import generate_with_target as gwt

        out = tmp_path / "out"
        gwt.main(["--save_path", str(out), "--load_path", str(run_dir),
                  "--data_path", str(corpus), "--data_format", "plain"])
        wavs = sorted(p.name for p in out.glob("*.wav"))
        # 2 utterances x 2 targets conv + 2 origs
        assert len([w for w in wavs if w.endswith("-conv.wav")]) == 4
        assert len([w for w in wavs if w.endswith("-orig.wav")]) == 2
        assert (out / "conv_log.txt").exists()

    def test_generate_from_list(self, run_dir, corpus, tmp_path):
        from td_vc_gan_tpu.cli import generate_from_list as gfl

        out = tmp_path / "out_list"
        gfl.main(["--save_path", str(out), "--load_path", str(run_dir),
                  "--data_path", str(corpus)])
        assert list(out.glob("*.wav")), "no conversions written"

    def test_generate_from_dataset_zero_excitation(self, run_dir, corpus, tmp_path):
        """The zero-excitation path must derive the F0 frame count from the
        PADDED length — the 4000-sample (non-x320) utterances here crashed
        the previous raw-length arithmetic with a shape mismatch."""
        from td_vc_gan_tpu.cli import generate_from_dataset as gfd

        out = tmp_path / "out_ds"
        gfd.main(["--save_path", str(out), "--load_path", str(run_dir),
                  "--data_path", str(corpus)])
        convs = list(out.glob("*_conv.wav"))
        origs = list(out.glob("*_orig.wav"))
        assert len(convs) == 4 and len(origs) == 2


class TestSmallCLIs:
    def test_preprocess_dataset(self, tmp_path):
        from td_vc_gan_tpu.cli import preprocess_dataset

        root = tmp_path / "raw"
        d = root / "spk0"
        d.mkdir(parents=True)
        rng = np.random.default_rng(0)
        write_audio(d / "a.wav", 0.01 * rng.standard_normal(3200), 16000)
        bad = 0.01 * rng.standard_normal(3200)
        bad[5] = np.nan
        write_audio(d / "b.wav", np.nan_to_num(bad), 16000)  # valid on disk
        out = tmp_path / "norm"
        preprocess_dataset.main([str(root), "--save_folder", str(out),
                                 "--normalization_db", "-25"])
        outs = list(out.rglob("*.wav"))
        assert outs, "no normalized wavs written"
        from td_vc_gan_tpu.data.audio_io import read_audio
        sig, sr = read_audio(outs[0])
        rms_db = 20 * np.log10(np.sqrt(np.mean(sig ** 2)) + 1e-12)
        assert abs(rms_db - (-25)) < 1.0

    def test_sample_f0(self, tmp_path):
        import matplotlib

        matplotlib.use("Agg")
        from td_vc_gan_tpu.cli import sample_f0

        rng = np.random.default_rng(0)
        t = np.arange(4000) / 16000
        conv_dir = tmp_path / "convs"
        conv_dir.mkdir()
        write_audio(conv_dir / "p1-s1-s2-conv.wav",
                    0.2 * np.sin(2 * np.pi * 220 * t), 16000)
        write_audio(conv_dir / "p1-s1-X-orig.wav",
                    0.2 * np.sin(2 * np.pi * 110 * t), 16000)
        out = tmp_path / "f0.png"
        sample_f0.main([str(conv_dir), "--out", str(out)])
        assert list(conv_dir.glob("*.json")) or out.exists()

    def test_gen_boxplots(self, tmp_path):
        import matplotlib

        matplotlib.use("Agg")
        from td_vc_gan_tpu.cli import gen_boxplots

        res = tmp_path / "index.json"
        res.write_text(json.dumps(
            {"mcd": {"p1-s1-s2": {"mcd": 5.0}, "p2-s1-s2": {"mcd": 6.0}}}))
        out = tmp_path / "box.png"
        gen_boxplots.main([f"ours={res}", "--out", str(out)])
        assert out.exists()


class TestRunTestFullPath:
    """run_test WITHOUT --skip_generate: generation feeds MCD + speaker-rec
    + report in one command — the reference's run_test.sh orchestration
    (test_scripts/vctk/run_test.sh:15-35) end to end."""

    def test_generate_then_eval(self, tmp_path):
        run_dir = make_run_dir(tmp_path)

        import pickle as pkl

        from td_vc_gan_tpu.data import audio_io

        root = tmp_path / "corpus"
        root.mkdir()
        rng = np.random.default_rng(0)
        entries = []
        # SHARED phrase ids across speakers so the MCD same-phrase pairing
        # finds conv-vs-target-orig pairs
        for spk in range(2):
            d = root / f"spk{spk}"
            d.mkdir()
            for u in range(2):
                t = np.arange(4000) / 16000
                sig = 0.25 * np.sin(2 * np.pi * (120 + 55 * spk + 20 * u) * t) * (
                    1 + 0.05 * rng.standard_normal(t.size))
                path = d / f"spk{spk}_{u:03d}.wav"  # vctk-style speaker_phrase
                audio_io.write_audio(path, sig, 16000)
                entries.append(f"{path}|spk{spk}")
        (root / "test_files").write_text("\n".join(entries) + "\n")
        with open(root / "speakers", "wb") as f:
            pkl.dump([("spk0", 0), ("spk1", 1)], f)

        from td_vc_gan_tpu.cli import run_test

        out = tmp_path / "testout"
        run_test.main([
            "--save_path", str(out), "--load_path", str(run_dir),
            "--data_path", str(root), "--data_format", "vctk",
        ])
        assert (out / "signals").is_dir()
        assert list((out / "signals").glob("*-conv.wav"))
        assert (out / "mcd_results").exists()
        assert (out / "spkrec_results").exists()
        assert list(out.glob("*.html")) or (out / "index.json").exists() \
            or list(out.glob("**/index.html"))
