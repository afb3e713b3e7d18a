"""First-party MOSNet (CNN-BLSTM) predicted-MOS model in JAX.

The reference's eval harness shells out to an external ``../MOSNet`` clone
(test_scripts/vctk/run_test.sh:26-30; the model code/weights are out-of-repo
there). This module makes the predictor first-party: the CNN-BLSTM
architecture of MOSNet (Lo et al., Interspeech 2019, the repo the reference
points at) re-implemented in JAX, plus an importer for the official Keras
``.h5`` weight files so published checkpoints drop in.

Architecture (CNN_BLSTM in the upstream model.py):

- input: magnitude spectrogram (T, 257) — 16 kHz, FFT 512, hop 256, hann,
  center/reflect padding (upstream utils.get_spectrograms);
- 4 conv blocks, channels (16, 32, 64, 128): each is 3x Conv2D k=3 'same'
  + ReLU, the last conv of each block strides (1, 3) over frequency
  (257 -> 86 -> 29 -> 10 -> 4);
- reshape to (T, 4*128) -> BLSTM(128, concat) -> per-frame Dense(128, relu)
  -> Dense(1) frame scores -> mean over time = utterance MOS.

Dropout / recurrent constraints are train-time only and omitted (inference).
Keras packs LSTM gates as [i, f, c(g), o] in one (in, 4u) kernel; the scan
cell below consumes that packing directly so the import is a pure copy.

Params are a flat dict with stable slot names (conv kernels/biases in model
order, lstm_fwd/bwd packed mats, dense1, frame); ``from_keras_h5`` maps the
Keras layer/weight ordering onto those slots by shape-checked sequence.
Channels-last everywhere, per repo convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

SR = 16000
FFT_SIZE = 512
HOP = 256
N_BINS = FFT_SIZE // 2 + 1  # 257
BLOCK_CHANNELS = (16, 32, 64, 128)
LSTM_UNITS = 128
DENSE_UNITS = 128


# ---------------------------------------------------------------------------
# feature extraction (upstream utils.get_spectrograms equivalent)
# ---------------------------------------------------------------------------


def spectrogram(wav: np.ndarray, sr: int = SR) -> np.ndarray:
    """Magnitude STFT (T, 257): hann(periodic), center=True reflect pad.

    Matches librosa.stft(n_fft=512, hop=256, win=512) as used by upstream
    MOSNet utils.get_spectrograms.
    """
    wav = np.asarray(wav, np.float32).reshape(-1)
    if sr != SR:
        from td_vc_gan_tpu.data.audio_io import resample

        wav = resample(wav, sr, SR)
    pad = FFT_SIZE // 2
    x = np.pad(wav, (pad, pad), mode="reflect")
    n_frames = 1 + (len(x) - FFT_SIZE) // HOP
    idx = np.arange(FFT_SIZE)[None, :] + HOP * np.arange(n_frames)[:, None]
    frames = x[idx]
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(FFT_SIZE) / FFT_SIZE)
    mag = np.abs(np.fft.rfft(frames * win[None, :], axis=1))
    return mag.astype(np.float32)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _conv_block(p: dict, idx: int, x: jnp.ndarray) -> jnp.ndarray:
    """3x (conv k=3 'same' + relu), last one strides (1, 3) on frequency."""
    for j in range(3):
        w = p[f"conv{idx}_{j}.kernel"]
        b = p[f"conv{idx}_{j}.bias"]
        stride = (1, 3) if j == 2 else (1, 1)
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=stride, padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        x = jax.nn.relu(x)
    return x


def _lstm_scan(kernel, recurrent, bias, xs, reverse: bool = False):
    """Keras-packed LSTM over time. xs (T, B, F) -> hs (T, B, units)."""
    units = recurrent.shape[0]
    xk = xs @ kernel + bias  # precompute input contribution for every step

    def step(carry, xk_t):
        h, c = carry
        z = xk_t + h @ recurrent
        i, f, g, o = jnp.split(z, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    b = xs.shape[1]
    h0 = jnp.zeros((b, units), xs.dtype)
    _, hs = jax.lax.scan(step, (h0, h0), xk, reverse=reverse)
    return hs


def mosnet_forward(params: dict, mag: jnp.ndarray):
    """mag (B, T, 257) -> (avg_score (B,), frame_scores (B, T)).

    Mirrors upstream CNN_BLSTM.build: conv stack on (B, T, 257, 1),
    reshape to (B, T, 4*128), BLSTM concat, frame dense head, time mean.
    """
    x = mag[..., None]
    for i in range(len(BLOCK_CHANNELS)):
        x = _conv_block(params, i, x)
    b, t = x.shape[0], x.shape[1]
    x = x.reshape(b, t, -1)  # (B, T, 4*128)

    xs = jnp.swapaxes(x, 0, 1)  # (T, B, F) for scan
    fwd = _lstm_scan(params["lstm_fwd.kernel"], params["lstm_fwd.recurrent"],
                     params["lstm_fwd.bias"], xs)
    bwd = _lstm_scan(params["lstm_bwd.kernel"], params["lstm_bwd.recurrent"],
                     params["lstm_bwd.bias"], xs, reverse=True)
    h = jnp.swapaxes(jnp.concatenate([fwd, bwd], axis=-1), 0, 1)  # (B, T, 256)

    h = jax.nn.relu(h @ params["dense1.kernel"] + params["dense1.bias"])
    frame = (h @ params["frame.kernel"] + params["frame.bias"])[..., 0]
    return frame.mean(axis=1), frame


# ---------------------------------------------------------------------------
# parameters
# ---------------------------------------------------------------------------


def _param_slots() -> list[tuple[str, tuple]]:
    """(name, shape) in Keras model order — the import contract."""
    slots: list[tuple[str, tuple]] = []
    cin = 1
    for i, ch in enumerate(BLOCK_CHANNELS):
        for j in range(3):
            slots.append((f"conv{i}_{j}.kernel", (3, 3, cin if j == 0 else ch, ch)))
            slots.append((f"conv{i}_{j}.bias", (ch,)))
        cin = ch
    feat = 4 * BLOCK_CHANNELS[-1]
    for d in ("fwd", "bwd"):
        slots.append((f"lstm_{d}.kernel", (feat, 4 * LSTM_UNITS)))
        slots.append((f"lstm_{d}.recurrent", (LSTM_UNITS, 4 * LSTM_UNITS)))
        slots.append((f"lstm_{d}.bias", (4 * LSTM_UNITS,)))
    slots.append(("dense1.kernel", (2 * LSTM_UNITS, DENSE_UNITS)))
    slots.append(("dense1.bias", (DENSE_UNITS,)))
    slots.append(("frame.kernel", (DENSE_UNITS, 1)))
    slots.append(("frame.bias", (1,)))
    return slots


def init_mosnet_params(rng: np.random.Generator | int = 0) -> dict:
    if not isinstance(rng, np.random.Generator):
        rng = np.random.default_rng(rng)
    params = {}
    for name, shape in _param_slots():
        if name.endswith(".bias"):
            params[name] = np.zeros(shape, np.float32)
        else:
            fan_in = int(np.prod(shape[:-1]))
            params[name] = (rng.standard_normal(shape) / np.sqrt(fan_in)).astype(
                np.float32)
    return params


def _h5_weight_arrays(path: str) -> list[np.ndarray]:
    """All weight arrays from a Keras save_weights/.h5, in model order.

    Requires the standard ``layer_names``/``weight_names`` attributes the
    Keras HDF5 format writes. There is deliberately NO visit-order fallback:
    h5 visit order is alphabetical, and fwd/bwd LSTM (and same-channel conv)
    weights share shapes, so a misordered file would pass the shape check
    and silently produce a wrong predictor (ADVICE r2 #2).
    """
    import h5py

    arrays: list[np.ndarray] = []
    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        layer_names = root.attrs.get("layer_names")
        if layer_names is None:
            raise ValueError(
                "MOSNet .h5 lacks the Keras 'layer_names' attribute; weight "
                "order would be ambiguous. Re-save with Keras save_weights "
                "or convert to .npz with the flat slot names of "
                "mosnet._param_slots().")
        for lname in layer_names:
            lname = lname.decode() if isinstance(lname, bytes) else lname
            g = root[lname]
            wnames = g.attrs.get("weight_names", [])
            for wn in wnames:
                wn = wn.decode() if isinstance(wn, bytes) else wn
                arrays.append(np.asarray(g[wn]))
    return arrays


def from_keras_h5(path: str) -> dict:
    """Map a Keras MOSNet .h5 onto the flat param dict, shape-checked."""
    arrays = _h5_weight_arrays(path)
    slots = _param_slots()
    arrays = [a for a in arrays if a.dtype.kind == "f"]
    if len(arrays) != len(slots):
        raise ValueError(
            f"MOSNet h5 has {len(arrays)} float arrays, expected {len(slots)}")
    params = {}
    for (name, shape), arr in zip(slots, arrays):
        if tuple(arr.shape) != tuple(shape):
            raise ValueError(
                f"MOSNet h5 slot {name}: got {arr.shape}, expected {shape}")
        params[name] = arr.astype(np.float32)
    return params


def load_mosnet(path: str) -> dict:
    """Load weights from .h5 (Keras) or .npz (flat slot names)."""
    if str(path).endswith(".npz"):
        data = np.load(path)
        return {k: np.asarray(data[k], np.float32) for k in data.files}
    return from_keras_h5(path)


class MOSPredictor:
    """Utterance MOS prediction (per-length jit, cached by XLA).

    Runs the exact frame count, unpadded, like upstream: zero-padding would
    leak into the backward-LSTM state and the convs' 'SAME' receptive field
    and make the score depend on length mod bucket. The model is tiny, so a
    retrace per distinct length is cheap.
    """

    def __init__(self, params: dict):
        self.params = jax.device_put(
            {k: jnp.asarray(v) for k, v in params.items()})
        self._fwd = jax.jit(mosnet_forward)  # retraces per distinct length

    def score(self, wav: np.ndarray, sr: int = SR) -> float:
        mag = spectrogram(wav, sr)
        avg, _ = self._fwd(self.params, mag[None])
        return float(np.asarray(avg)[0])
