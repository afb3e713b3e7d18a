"""Host input pipeline tests: audio IO, dataset semantics, corruption."""

import pickle

import numpy as np
import pytest

from td_vc_gan_tpu.data import audio_io, corruption
from td_vc_gan_tpu.data.dataset import WaveDataset, SpeakerDataset, collate, make_train_iterator
from td_vc_gan_tpu.data.pairs import PairsDataset


@pytest.fixture
def wav_dataset(tmp_path, rng):
    """4 speakers x 3 wavs of varied lengths + manifests."""
    entries = []
    for spk in range(4):
        d = tmp_path / f"spk{spk}"
        d.mkdir()
        for j in range(3):
            n = 4000 + 2560 * j + spk * 320
            sig = 0.2 * np.sin(2 * np.pi * (100 + 50 * spk) * np.arange(n) / 16000)
            path = d / f"utt{j}.wav"
            audio_io.write_audio(path, sig, 16000)
            entries.append(f"{path}|spk{spk}")
    (tmp_path / "train_files").write_text("\n".join(entries) + "\n")
    (tmp_path / "test_files").write_text("\n".join(entries[:4]) + "\n")
    with open(tmp_path / "speakers", "wb") as f:
        pickle.dump({f"spk{i}": i for i in range(4)}, f)
    return tmp_path


class TestAudioIO:
    def test_wav_roundtrip(self, tmp_path, rng):
        sig = (0.5 * rng.standard_normal(1000)).clip(-1, 1)
        audio_io.write_audio(tmp_path / "a.wav", sig, 16000)
        out, sr = audio_io.read_audio(tmp_path / "a.wav")
        assert sr == 16000
        np.testing.assert_allclose(out, sig, atol=1e-4)

    def test_resample_on_mismatch(self, tmp_path, rng):
        sig = np.sin(2 * np.pi * 440 * np.arange(8000) / 8000)
        audio_io.write_audio(tmp_path / "b.wav", sig, 8000)
        out, sr = audio_io.read_audio(tmp_path / "b.wav", target_sr=16000)
        assert sr == 16000 and abs(len(out) - 16000) < 4

    def test_npy(self, tmp_path, rng):
        sig = rng.standard_normal(500).astype(np.float32)
        np.save(tmp_path / "c.npy", sig)
        out, _ = audio_io.read_audio(tmp_path / "c.npy", target_sr=16000)
        np.testing.assert_allclose(out, sig)


class TestWaveDataset:
    def test_item_shapes_and_padding(self, wav_dataset):
        ds = WaveDataset(
            wav_dataset / "train_files", wav_dataset / "speakers",
            max_segment_size=8960, normalization_db=-30, data_augment=True,
        )
        assert ds.num_spk == 4 and len(ds) == 12
        for i in range(len(ds)):
            item = ds.__getitem__(i)
            sig = item["signal"]
            assert sig.shape[0] % 320 == 0
            assert sig.shape[0] >= 5120
            assert sig.shape[0] <= 8960
            assert 0 <= int(item["label"]) < 4

    def test_pad_to_max_gives_static_shapes(self, wav_dataset):
        ds = WaveDataset(
            wav_dataset / "train_files", wav_dataset / "speakers",
            max_segment_size=8960, pad_to_max=True,
        )
        shapes = {ds.__getitem__(i)["signal"].shape for i in range(len(ds))}
        assert shapes == {(8960,)}

    def test_rms_normalization(self, wav_dataset):
        ds = WaveDataset(
            wav_dataset / "train_files", wav_dataset / "speakers",
            normalization_db=-30,
        )
        sig = ds.load_signal(0, np.random.default_rng(0))
        # padding dilutes RMS; check it is within a sensible band
        rms_db = 20 * np.log10(np.sqrt((sig**2).mean()) + 1e-12)
        assert -35 < rms_db < -25

    def test_determinism_per_epoch(self, wav_dataset):
        ds = WaveDataset(
            wav_dataset / "train_files", wav_dataset / "speakers",
            max_segment_size=5120, data_augment=True,
        )
        a = ds.__getitem__(3, epoch=1)["signal"]
        b = ds.__getitem__(3, epoch=1)["signal"]
        c = ds.__getitem__(3, epoch=2)["signal"]
        np.testing.assert_array_equal(a, b)
        assert np.abs(a - c).max() > 0

    def test_corrupt_branch(self, wav_dataset):
        ds = WaveDataset(
            wav_dataset / "train_files", wav_dataset / "speakers",
            max_segment_size=5120, corrupt=True,
        )
        item = ds.__getitem__(0)
        assert item["corrupted"].shape == item["signal"].shape
        assert np.isfinite(item["corrupted"]).all()
        assert np.abs(item["corrupted"] - item["signal"]).max() > 1e-6

    def test_speaker_dataset_filters(self, wav_dataset):
        ds = SpeakerDataset("spk2", wav_dataset / "train_files", wav_dataset / "speakers")
        assert len(ds) == 3
        assert all(label == "spk2" for _, label in ds.entries)

    def test_add_new_spks(self, wav_dataset, tmp_path):
        extra = wav_dataset / "extra.wav"
        audio_io.write_audio(extra, np.zeros(6400), 16000)
        lines = (wav_dataset / "train_files").read_text() + f"{extra}|newspk\n"
        (wav_dataset / "train_files2").write_text(lines)
        ds = WaveDataset(wav_dataset / "train_files2", wav_dataset / "speakers",
                         add_new_spks=True)
        assert ds.num_spk == 5 and ds.spk_dict["newspk"] == 4


class TestCollateAndIterator:
    def test_collate_pads_to_batch_max(self, rng):
        items = [
            {"signal": rng.standard_normal(100).astype(np.float32), "label": np.int32(0)},
            {"signal": rng.standard_normal(80).astype(np.float32), "label": np.int32(1)},
        ]
        batch = collate(items)
        assert batch["signal"].shape == (2, 100)
        assert batch["label"].tolist() == [0, 1]
        assert (batch["signal"][1, 80:] == 0).all()

    def test_train_iterator_static_shapes(self, wav_dataset):
        ds = WaveDataset(
            wav_dataset / "train_files", wav_dataset / "speakers",
            max_segment_size=5120, pad_to_max=True,
        )
        it = make_train_iterator(ds, batch_size=4, num_workers=2)
        for _ in range(4):
            epoch, batch = next(it)
            assert batch["signal"].shape == (4, 5120)
            assert batch["label"].shape == (4,)
        it.close()


class TestPairs:
    def test_pairs_dataset(self, wav_dataset):
        entries = [line.split("|") for line in
                   (wav_dataset / "train_files").read_text().strip().splitlines()]
        pairs = [f"conv{i}|{entries[i][0]}|{entries[i+3][0]}" for i in range(3)]
        (wav_dataset / "pairs").write_text("\n".join(pairs) + "\n")
        ds = PairsDataset(wav_dataset / "pairs", wav_dataset / "train_files",
                          wav_dataset / "speakers")
        assert len(ds) == 3
        item = ds.__getitem__(0)
        assert item["conv_name"] == "conv0"
        assert item["source"].ndim == 1 and item["target"].ndim == 1
        assert int(item["source_label"]) == 0 and int(item["target_label"]) == 1


class TestCorruption:
    def test_random_eq_changes_spectrum_not_shape(self, rng):
        wav = 0.1 * rng.standard_normal(8000)
        out = corruption.random_eq(wav, 16000, np.random.default_rng(0))
        assert out.shape == wav.shape
        assert np.isfinite(out).all()
        assert np.abs(out - wav).max() > 1e-4

    def test_biquads_are_stable(self):
        sos = corruption.params2sos(
            np.full(10, 12.0), corruption.EQ_CENTERS, np.full(10, 2.0), 16000
        )
        import scipy.signal as sps

        imp = np.zeros(4000)
        imp[0] = 1.0
        out = sps.sosfilt(sos, imp)
        assert np.abs(out[-100:]).max() < 1e-3  # impulse response decays

    def test_change_gender_shifts_pitch(self, rng):
        sr = 16000
        t = np.arange(sr) / sr
        wav = 0.3 * np.sin(2 * np.pi * 150 * t)
        out = corruption.change_gender(wav, sr, 60, 600, 1.0, 1.5, 1.0)
        assert out.shape == wav.shape and np.isfinite(out).all()
        f0_out = corruption.estimate_f0_contour(out, sr)
        voiced = f0_out[f0_out > 0]
        assert voiced.size > 10
        med = np.median(voiced)
        assert 190 < med < 260  # ~150*1.5=225 within tolerance

    def test_corrupt_is_failure_tolerant(self, rng):
        # degenerate input (all zeros) must not crash
        out = corruption.corrupt(np.zeros(5120), 16000, np.random.default_rng(0))
        assert out.shape == (5120,)
        assert np.isfinite(out).all()


class TestPrecorrupt:
    """Offline corruption variants (cli/precorrupt_dataset) + the dataset's
    aligned replay of the per-item gain/flip/crop transform."""

    def _build(self, wav_dataset, variants=2):
        from td_vc_gan_tpu.cli import precorrupt_dataset

        out = wav_dataset / "precorrupt"
        index_path = precorrupt_dataset.main([
            str(wav_dataset / "train_files"),
            "--save_folder", str(out),
            "--variants", str(variants),
            "--normalization_db", "-27",
            "--workers", "2",
        ])
        return index_path

    def test_cli_writes_variants_and_index(self, wav_dataset):
        import pickle

        index_path = self._build(wav_dataset)
        with open(index_path, "rb") as f:
            index = pickle.load(f)
        assert len(index) == 12  # 4 speakers x 3 wavs
        for paths in index.values():
            assert len(paths) == 2
            for p in paths:
                sig, sr = audio_io.read_audio(p)
                assert sr == 16000 and np.isfinite(sig).all() and len(sig) > 0

    def test_dataset_serves_aligned_variants(self, wav_dataset):
        import pickle

        index_path = self._build(wav_dataset)
        ds = WaveDataset(
            wav_dataset / "train_files", wav_dataset / "speakers",
            max_segment_size=8960, normalization_db=-27, data_augment=True,
            corrupt=True, pad_to_max=True, precorrupted_index=index_path,
        )
        item = ds.__getitem__(0, epoch=0)
        sig, cor = item["signal"], item["corrupted"]
        assert cor.shape == sig.shape and cor.dtype == np.float32
        assert np.isfinite(cor).all() and np.abs(cor).max() > 0

        # the replay must be sample-aligned with one stored variant: undo
        # the recorded transform and compare against the file
        rng = np.random.default_rng(np.random.SeedSequence([ds.seed, 0, 0]))
        _, meta = ds._load_signal_meta(0, rng)
        with open(index_path, "rb") as f:
            index = pickle.load(f)
        stored = [audio_io.read_audio(p, 16000)[0] for p in index[ds.entries[0][0]]]
        matches = []
        for full in stored:
            replay = ds._replay_transform(full, meta)
            matches.append(np.allclose(replay, cor, atol=1e-6))
        assert any(matches)

    def test_fallback_when_variant_missing(self, wav_dataset):
        import pickle

        index_path = self._build(wav_dataset)
        with open(index_path, "rb") as f:
            index = pickle.load(f)
        index.pop(sorted(index)[0], None)  # drop entry 0's variants
        with open(index_path, "wb") as f:
            pickle.dump(index, f)
        ds = WaveDataset(
            wav_dataset / "train_files", wav_dataset / "speakers",
            max_segment_size=8960, normalization_db=-27,
            corrupt=True, pad_to_max=True, precorrupted_index=index_path,
        )
        # entry whose variants were dropped falls back to online corruption
        first = ds.entries.index(
            [e for e in ds.entries if e[0] not in index][0])
        item = ds.__getitem__(first, epoch=0)
        assert item["corrupted"].shape == item["signal"].shape
        assert np.isfinite(item["corrupted"]).all()


class TestSliceReadFastPath:
    """The cached-header slice-read fast path (audio_io.wav_meta /
    read_wav_slice + WaveDataset._file_facts) must be bit-identical to the
    full-decode path — scalar normalize/gain/flip commute with cropping."""

    def test_wav_meta_and_slice_parity_int16(self, tmp_path, rng):
        sig = (0.5 * rng.standard_normal(20000)).clip(-1, 1)
        audio_io.write_audio(tmp_path / "a.wav", sig, 16000)
        m = audio_io.wav_meta(tmp_path / "a.wav")
        assert m is not None and m.sr == 16000 and m.n_frames == 20000
        assert m.channels == 1 and m.dtype == "<i2"
        full, _ = audio_io.read_audio(tmp_path / "a.wav")
        sl = audio_io.read_wav_slice(tmp_path / "a.wav", m, 1234, 9876)
        assert np.array_equal(sl, full[1234:9876])
        # out-of-range bounds clamp to the file
        tail = audio_io.read_wav_slice(tmp_path / "a.wav", m, 19000, 25000)
        assert np.array_equal(tail, full[19000:])

    def test_slice_parity_float32_and_stereo(self, tmp_path, rng):
        from scipy.io import wavfile

        f32 = (0.3 * rng.standard_normal(5000)).astype(np.float32)
        wavfile.write(tmp_path / "f.wav", 16000, f32)
        m = audio_io.wav_meta(tmp_path / "f.wav")
        assert m is not None and m.dtype == "<f4"
        full, _ = audio_io.read_audio(tmp_path / "f.wav")
        assert np.array_equal(
            audio_io.read_wav_slice(tmp_path / "f.wav", m, 100, 600),
            full[100:600],
        )

        st = (8000 * rng.standard_normal((4000, 2))).astype(np.int16)
        wavfile.write(tmp_path / "s.wav", 16000, st)
        m2 = audio_io.wav_meta(tmp_path / "s.wav")
        assert m2 is not None and m2.channels == 2 and m2.n_frames == 4000
        full2, _ = audio_io.read_audio(tmp_path / "s.wav")  # channel-meaned
        assert np.array_equal(
            audio_io.read_wav_slice(tmp_path / "s.wav", m2, 50, 450),
            full2[50:450],
        )

    def test_wav_meta_rejects_non_riff(self, tmp_path):
        (tmp_path / "x.wav").write_bytes(b"not a riff file at all.......")
        assert audio_io.wav_meta(tmp_path / "x.wav") is None
        assert audio_io.wav_meta(tmp_path / "missing.wav") is None

    @pytest.fixture
    def long_wav_dataset(self, tmp_path, rng):
        """Utterances LONGER than max_segment so the crop fast path engages,
        plus precorrupted variants for the replay fast path."""
        lines, index = [], {}
        for i in range(4):
            n = 20000 + 3000 * i
            sig = 0.2 * np.sin(
                2 * np.pi * (110 + 30 * i) * np.arange(n) / 16000
            ) * (1 + 0.05 * rng.standard_normal(n))
            path = tmp_path / f"long{i}.wav"
            audio_io.write_audio(path, sig, 16000)
            var = tmp_path / f"long{i}.cor.wav"
            cor = corruption.corrupt(sig, 16000, np.random.default_rng(i))
            audio_io.write_audio(var, cor, 16000)
            index[str(path)] = [str(var)]
            lines.append(f"{path}|spk{i % 2}")
        (tmp_path / "train_files").write_text("\n".join(lines) + "\n")
        with open(tmp_path / "speakers", "wb") as f:
            pickle.dump({"spk0": 0, "spk1": 1}, f)
        with open(tmp_path / "precorrupt_index.pkl", "wb") as f:
            pickle.dump(index, f)
        return tmp_path

    def test_dataset_fast_path_bitwise_parity(self, long_wav_dataset, monkeypatch):
        import td_vc_gan_tpu.data.dataset as dataset_mod

        kw = dict(
            max_segment_size=8960, normalization_db=-27, data_augment=True,
            corrupt=True, pad_to_max=True,
            precorrupted_index=long_wav_dataset / "precorrupt_index.pkl",
        )
        fast = WaveDataset(long_wav_dataset / "train_files",
                           long_wav_dataset / "speakers", **kw)
        slow = WaveDataset(long_wav_dataset / "train_files",
                           long_wav_dataset / "speakers", **kw)
        # warm: resolve every file's header + normalization gain so the fast
        # path engages (it needs the cached gain from one full decode)
        for i in range(len(fast.entries)):
            fast.__getitem__(i, epoch=0)
        assert all(m is not None for m, _ in fast._file_cache.values())
        monkeypatch.setattr(dataset_mod, "wav_meta", lambda p: None)
        slow._file_cache.clear()  # re-resolve with wav_meta disabled
        for epoch in range(3):
            for i in range(len(fast.entries)):
                a = fast.__getitem__(i, epoch=epoch)
                b = slow.__getitem__(i, epoch=epoch)
                assert np.array_equal(a["signal"], b["signal"]), (epoch, i)
                assert np.array_equal(a["corrupted"], b["corrupted"]), (epoch, i)
                assert a["label"] == b["label"]

    def test_fast_path_without_normalization_or_augment(self, long_wav_dataset, monkeypatch):
        import td_vc_gan_tpu.data.dataset as dataset_mod

        kw = dict(max_segment_size=8960, pad_to_max=True)
        fast = WaveDataset(long_wav_dataset / "train_files",
                           long_wav_dataset / "speakers", **kw)
        slow = WaveDataset(long_wav_dataset / "train_files",
                           long_wav_dataset / "speakers", **kw)
        # resolve headers pre-patch: with no normalization the fast path
        # engages on the very first item touch
        for path, _ in fast.entries:
            assert fast._file_facts(path)[0] is not None
        monkeypatch.setattr(dataset_mod, "wav_meta", lambda p: None)
        for i in range(len(fast.entries)):
            a = fast.__getitem__(i, epoch=0)
            b = slow.__getitem__(i, epoch=0)
            assert np.array_equal(a["signal"], b["signal"]), i


def test_fast_len_is_5_smooth():
    """_fast_len must honor its 5-smooth contract: an odd 3^b*5^c candidate
    floor-divided by 2 is NOT smooth (e.g. 75//2=37, prime) and previously
    leaked through, defeating the fast-FFT-length purpose."""

    def smooth(n):
        for p in (2, 3, 5):
            while n % p == 0:
                n //= p
        return n == 1

    for n in list(range(16, 5000)) + [16403, 38, 68, 122, 99991]:
        m = corruption._fast_len(n)
        assert m >= 16 and smooth(m), (n, m)
