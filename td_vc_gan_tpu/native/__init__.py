"""ctypes bindings for the native host DSP library (libtdvc_audio.so).

Build: ``cmake -S td_vc_gan_tpu/native -B td_vc_gan_tpu/native/build &&
cmake --build td_vc_gan_tpu/native/build`` (or ``python -m
td_vc_gan_tpu.native.build``). Every entry point has a pure-Python/scipy
fallback so the framework runs without the library; the native paths are the
fast ones used by the input-pipeline workers and the eval harness.
"""

from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np

_LIB = None
_SEARCHED = False


def _build(force: bool = False) -> None:
    """Compile the library from source on first use (one small .cpp; ~1 s).

    The .so is a build artifact, not a committed binary; any g++ works.
    Compiles to a pid-unique temp file and ``os.replace``s it into place so
    concurrent first-use builds (e.g. multi-host test workers) can't leave a
    half-written binary behind.
    """
    import os
    import subprocess

    root = Path(__file__).parent
    lib = root / "lib" / "libtdvc_audio.so"
    src = root / "src" / "audio_kernels.cpp"
    if (lib.exists() and not force) or not src.exists():
        return
    lib.parent.mkdir(exist_ok=True)
    tmp = lib.with_suffix(f".tmp{os.getpid()}.so")
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-o", str(tmp), str(src)],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, lib)
    except Exception:
        tmp.unlink(missing_ok=True)  # fall through to the pure-Python paths


def _try_dlopen(path: Path):
    """dlopen + register signatures; None on corrupt/stale binaries.

    A stale pre-v2 .so (or one truncated by a crashed build) must degrade to
    the Python fallbacks, not crash callers — hence AttributeError (missing
    symbol) is treated like OSError (bad ELF). tdvc_freqt is the one
    optional symbol (its wrapper hasattr-guards it).
    """
    try:
        lib = ctypes.CDLL(str(path))
        lib.tdvc_sosfilt.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ]
        lib.tdvc_dtw_path.restype = ctypes.c_int
        lib.tdvc_dtw_path.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
        ]
        lib.tdvc_psola_ola.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
        if hasattr(lib, "tdvc_freqt"):
            lib.tdvc_freqt.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                ctypes.c_int, ctypes.c_int, ctypes.c_double,
                ctypes.POINTER(ctypes.c_double),
            ]
        return lib
    except (OSError, AttributeError):
        return None


def _load():
    global _LIB, _SEARCHED
    if _SEARCHED:
        return _LIB
    _SEARCHED = True
    _build()
    primary = Path(__file__).parent / "lib" / "libtdvc_audio.so"
    for cand in [primary, Path(__file__).parent / "build" / "libtdvc_audio.so"]:
        if cand.exists():
            _LIB = _try_dlopen(cand)
            if _LIB is None and cand == primary:
                _build(force=True)  # stale/corrupt managed binary: rebuild once
                _LIB = _try_dlopen(cand)
            break
    return _LIB


def available() -> bool:
    return _load() is not None


def sosfilt(sos: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Biquad-cascade filter; native when built, scipy fallback otherwise."""
    lib = _load()
    if lib is None:
        import scipy.signal as sps

        return sps.sosfilt(sos, x)
    sos = np.ascontiguousarray(sos, dtype=np.float64)
    out = np.ascontiguousarray(x, dtype=np.float64).copy()
    lib.tdvc_sosfilt(
        sos.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), sos.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), out.size,
    )
    return out


def dtw(dist: np.ndarray) -> tuple[float, np.ndarray]:
    """Full DTW over a distance matrix -> (total_cost, path (L, 2))."""
    lib = _load()
    n, m = dist.shape
    if lib is None:
        return _dtw_numpy(dist)
    d = np.ascontiguousarray(dist, dtype=np.float32)
    path = np.zeros((n + m, 2), dtype=np.int32)
    cost = ctypes.c_double(0.0)
    length = lib.tdvc_dtw_path(
        d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, m,
        path.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), ctypes.byref(cost),
    )
    return float(cost.value), path[:length]


def _dtw_numpy(dist: np.ndarray) -> tuple[float, np.ndarray]:
    n, m = dist.shape
    acc = np.full((n + 1, m + 1), np.inf)
    acc[0, 0] = 0.0
    for i in range(1, n + 1):
        row_prev = acc[i - 1]
        row = acc[i]
        for j in range(1, m + 1):
            row[j] = dist[i - 1, j - 1] + min(row_prev[j - 1], row_prev[j], row[j - 1])
    # backtrack
    path = []
    i, j = n, m
    while i > 1 or j > 1:
        path.append((i - 1, j - 1))
        opts = [
            (acc[i - 1, j - 1], i - 1, j - 1),
            (acc[i - 1, j], i - 1, j),
            (acc[i, j - 1], i, j - 1),
        ]
        _, i, j = min(opts, key=lambda t: t[0])
    path.append((0, 0))
    return float(acc[n, m]), np.asarray(path[::-1], dtype=np.int32)


def freqt(c: np.ndarray, order: int, alpha: float) -> np.ndarray:
    """Batched SPTK freqt: (n, L) cepstra -> (n, order+1) warped cepstra."""
    c = np.ascontiguousarray(np.atleast_2d(c), dtype=np.float64)
    n, L = c.shape
    out = np.zeros((n, order + 1), dtype=np.float64)
    lib = _load()
    if lib is not None and hasattr(lib, "tdvc_freqt"):
        lib.tdvc_freqt(
            c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n, L, order,
            ctypes.c_double(alpha),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return out
    # numpy fallback: the k-recursion stays a loop, vectorized over frames
    g = out
    beta = 1.0 - alpha * alpha
    for k in range(L - 1, -1, -1):
        d = g.copy()
        g[:, 0] = c[:, k] + alpha * d[:, 0]
        if order >= 1:
            g[:, 1] = beta * d[:, 0] + alpha * d[:, 1]
        for i in range(2, order + 1):
            g[:, i] = d[:, i - 1] + alpha * (d[:, i] - g[:, i - 1])
    return g


def psola_ola(wav, ana, pos, half, out_len):
    """Grain overlap-add -> (out, norm) float32 arrays."""
    lib = _load()
    wav = np.ascontiguousarray(wav, dtype=np.float32)
    ana = np.ascontiguousarray(ana, dtype=np.int64)
    pos = np.ascontiguousarray(pos, dtype=np.int64)
    half = np.ascontiguousarray(half, dtype=np.int32)
    out = np.zeros(out_len, dtype=np.float32)
    norm = np.zeros(out_len, dtype=np.float32)
    if lib is None:
        for k in range(len(ana)):
            h = int(half[k])
            if h <= 0:
                continue
            width = 2 * h
            win = 0.5 * (1 - np.cos(2 * np.pi * np.arange(width) / width))
            src_lo, src_hi = ana[k] - h, ana[k] + h
            dst_lo = pos[k] - h
            s0, s1 = max(src_lo, 0), min(src_hi, len(wav))
            d0, d1 = dst_lo + (s0 - src_lo), dst_lo + (s1 - src_lo)
            if d0 < 0:
                s0 += -d0
                d0 = 0
            if d1 > out_len:
                s1 -= d1 - out_len
                d1 = out_len
            if s1 <= s0:
                continue
            w = win[s0 - src_lo : s1 - src_lo]
            out[d0:d1] += wav[s0:s1] * w
            norm[d0:d1] += w
        return out, norm
    lib.tdvc_psola_ola(
        wav.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(wav),
        ana.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        half.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(ana),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        norm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out_len,
    )
    return out, norm
