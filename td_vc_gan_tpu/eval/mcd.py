"""Mel-cepstral distortion + F0 statistics between converted and target audio.

Re-design of test_scripts/common/test_mcd.py:29-172. The reference computes
24-dim mel-cepstra from a WORLD (cheaptrick) envelope via pysptk (α=0.42,
5 ms hop), keeps voiced-only frames, aligns with fastdtw, and reports
dist/len(path) in dB plus log-F0 mean/var errors. Neither WORLD nor pysptk
exists in this image, so the envelope comes from a cepstrally-liftered STFT
(a standard homomorphic envelope) warped onto the mel scale by matrix
interpolation; alignment runs through the native C++ DTW
(td_vc_gan_tpu.native.dtw). Numbers are comparable *within* this harness
(same estimator both sides), which is what the reference's conv-vs-orig /
orig-vs-orig comparison structure needs.
"""

from __future__ import annotations

import numpy as np
from scipy.fft import dct, rfft, irfft

from td_vc_gan_tpu import native
from td_vc_gan_tpu.data.corruption import estimate_f0_contour

MCD_COEFS = 24
HOP_S = 0.005
FRAME_S = 0.032
LIFTER_Q = 40  # cepstral cutoff for the spectral envelope


def _frames(x: np.ndarray, sr: int):
    frame = int(FRAME_S * sr)
    hop = int(HOP_S * sr)
    n = max(0, (len(x) - frame) // hop + 1)
    idx = np.arange(n)[:, None] * hop + np.arange(frame)[None, :]
    return x[idx] * np.hanning(frame)


def spectral_envelope(x: np.ndarray, sr: int) -> np.ndarray:
    """Cepstrally-smoothed log power envelope per frame: (n_frames, n_freq)."""
    f = _frames(x, sr)
    spec = np.abs(rfft(f, axis=-1)) ** 2 + 1e-10
    logs = np.log(spec)
    ceps = irfft(logs, axis=-1)
    ceps[:, LIFTER_Q:-LIFTER_Q] = 0.0  # low-quefrency lifter => envelope
    return np.real(rfft(ceps, axis=-1))


def mel_cepstra(x: np.ndarray, sr: int, n_coefs: int = MCD_COEFS) -> np.ndarray:
    """Mel-warped cepstra of the spectral envelope, coefficients 1..n."""
    env = 0.5 * spectral_envelope(x, sr)  # log-amplitude (mcep convention)
    n_freq = env.shape[-1]
    freqs = np.linspace(0, sr / 2, n_freq)
    mel = 2595.0 * np.log10(1.0 + freqs / 700.0)
    mel_grid = np.linspace(mel[0], mel[-1], n_freq)
    # resample the log envelope onto a uniform mel grid (α-warp equivalent)
    warped = np.stack([np.interp(mel_grid, mel, e) for e in env])
    mc = dct(warped, type=2, norm="ortho", axis=-1)
    return mc[:, 1 : n_coefs + 1]


def _voiced_mask_frames(x: np.ndarray, sr: int) -> np.ndarray:
    f0 = estimate_f0_contour(x, sr, frame_s=FRAME_S, hop_s=HOP_S)
    return f0 > 0, f0


def compute_mcd(conv: np.ndarray, target: np.ndarray, sr: int = 16000) -> dict:
    """MCD (dB) between converted and target utterances."""
    mask_c, f0_c = _voiced_mask_frames(conv, sr)
    mask_t, f0_t = _voiced_mask_frames(target, sr)
    mc_c = mel_cepstra(conv, sr)
    mc_t = mel_cepstra(target, sr)
    n_c = min(len(mc_c), len(mask_c))
    n_t = min(len(mc_t), len(mask_t))
    mc_c = mc_c[:n_c][mask_c[:n_c]]
    mc_t = mc_t[:n_t][mask_t[:n_t]]
    if len(mc_c) < 2 or len(mc_t) < 2:
        return {"mcd": float("nan")}

    # pairwise euclidean distances -> DTW (native C++)
    d2 = (
        np.sum(mc_c**2, -1)[:, None]
        + np.sum(mc_t**2, -1)[None, :]
        - 2 * mc_c @ mc_t.T
    )
    dist = np.sqrt(np.maximum(d2, 0)).astype(np.float32)
    total, path = native.dtw(dist)
    k = 10.0 / np.log(10.0) * np.sqrt(2.0)
    out = {"mcd": k * total / len(path)}

    # F0 statistics (test_mcd.py:83-122)
    for name, f0 in (("conv", f0_c), ("tgt", f0_t)):
        v = f0[f0 > 0]
        out[f"logf0_mean_{name}"] = float(np.log(v).mean()) if v.size else float("nan")
        out[f"logf0_var_{name}"] = float(np.log(v).var()) if v.size else float("nan")
    out["logf0_mean_err"] = abs(out["logf0_mean_conv"] - out["logf0_mean_tgt"])
    out["logf0_var_err"] = abs(out["logf0_var_conv"] - out["logf0_var_tgt"])
    out["f0_ratio"] = float(
        np.exp(out["logf0_mean_conv"] - out["logf0_mean_tgt"])
    )
    return out


def evaluate_directory(conv_dir, parse_conv, ref_lookup, sr: int = 16000) -> dict:
    """Run MCD over a directory of ``*-conv.wav`` files.

    parse_conv: filename -> (phrase, src, tgt) or None; ref_lookup:
    (phrase, tgt) -> path of the target-speaker original.
    """
    from pathlib import Path

    from td_vc_gan_tpu.data.audio_io import read_audio

    results = {}
    for f in sorted(Path(conv_dir).glob("*-conv.wav")):
        parsed = parse_conv(f.name)
        if parsed is None:
            continue
        phrase, src, tgt = parsed
        ref_path = ref_lookup(phrase, tgt)
        if ref_path is None:
            continue
        conv, _ = read_audio(f, sr)
        ref, _ = read_audio(ref_path, sr)
        results[f.name] = compute_mcd(conv, ref, sr)
    return results
