"""First-party MOSNet: forward semantics, Keras-h5 import layout, e2e eval.

The reference uses an out-of-repo MOSNet clone (test_scripts/vctk/
run_test.sh:26-30); ours is first-party (models/mosnet.py). No TF in this
image, so parity is pinned the same way as torchcrepe/WavLM importers: a
fabricated checkpoint with the exact upstream layout + a hand-rolled
numpy reference for the LSTM recurrence.
"""

import numpy as np
import pytest

from td_vc_gan_tpu.models import mosnet


def test_spectrogram_framing():
    wav = np.random.default_rng(0).standard_normal(16000).astype(np.float32)
    mag = mosnet.spectrogram(wav)
    # center=True: 1 + floor(len/hop) frames, 257 bins (librosa convention)
    assert mag.shape == (1 + len(wav) // mosnet.HOP, mosnet.N_BINS)
    assert np.isfinite(mag).all() and (mag >= 0).all()
    # DC bin of a constant signal frame equals the window sum
    const = np.ones(2048, np.float32)
    m2 = mosnet.spectrogram(const)
    win_sum = 0.5 * mosnet.FFT_SIZE  # hann sums to N/2
    assert abs(m2[4, 0] - win_sum) / win_sum < 1e-4


def test_lstm_scan_matches_numpy_reference():
    rng = np.random.default_rng(1)
    feat, units, t, b = 6, 4, 5, 2
    k = rng.standard_normal((feat, 4 * units)).astype(np.float32)
    r = rng.standard_normal((units, 4 * units)).astype(np.float32) * 0.3
    bias = rng.standard_normal(4 * units).astype(np.float32) * 0.1
    xs = rng.standard_normal((t, b, feat)).astype(np.float32)

    def sigmoid(v):
        return 1.0 / (1.0 + np.exp(-v))

    h = np.zeros((b, units), np.float32)
    c = np.zeros((b, units), np.float32)
    want = []
    for step in range(t):
        z = xs[step] @ k + h @ r + bias
        i, f, g, o = np.split(z, 4, axis=-1)
        c = sigmoid(f) * c + sigmoid(i) * np.tanh(g)
        h = sigmoid(o) * np.tanh(c)
        want.append(h.copy())
    got = np.asarray(mosnet._lstm_scan(k, r, bias, xs))
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-5, atol=2e-5)

    # reverse=True processes time back-to-front and keeps output order
    got_rev = np.asarray(mosnet._lstm_scan(k, r, bias, xs, reverse=True))
    got_flip = np.asarray(mosnet._lstm_scan(k, r, bias, xs[::-1]))[::-1]
    np.testing.assert_allclose(got_rev, got_flip, rtol=2e-5, atol=2e-5)


def test_forward_shapes_and_freq_collapse():
    params = mosnet.init_mosnet_params(0)
    mag = np.random.default_rng(2).random((2, 32, 257)).astype(np.float32)
    avg, frame = mosnet.mosnet_forward(
        {k: np.asarray(v) for k, v in params.items()}, mag)
    assert avg.shape == (2,) and frame.shape == (2, 32)
    assert np.isfinite(np.asarray(avg)).all()
    np.testing.assert_allclose(np.asarray(frame).mean(axis=1), np.asarray(avg),
                               rtol=1e-5, atol=1e-5)


def _write_keras_h5(path, params):
    """Fabricate the upstream full-model .h5 layout: model_weights root with
    layer_names/weight_names attrs + an optimizer_weights group that the
    importer must ignore."""
    h5py = pytest.importorskip("h5py")
    slots = mosnet._param_slots()
    by_name = dict(params)
    with h5py.File(path, "w") as f:
        mw = f.create_group("model_weights")
        layers = []
        idx = 0

        def add_layer(lname, weights):
            nonlocal idx
            g = mw.create_group(lname)
            wnames = []
            for suffix, slot in weights:
                wn = f"{lname}/{suffix}:0"
                g.create_dataset(wn, data=by_name[slot])
                wnames.append(wn.encode())
                idx += 1
            g.attrs["weight_names"] = wnames
            layers.append(lname.encode())

        add_layer("input_1", [])
        add_layer("reshape", [])
        n = 0
        for i in range(4):
            for j in range(3):
                lname = "conv2d" if n == 0 else f"conv2d_{n}"
                add_layer(lname, [("kernel", f"conv{i}_{j}.kernel"),
                                  ("bias", f"conv{i}_{j}.bias")])
                n += 1
        add_layer("reshape_1", [])
        add_layer("bidirectional", [
            ("forward_lstm/kernel", "lstm_fwd.kernel"),
            ("forward_lstm/recurrent_kernel", "lstm_fwd.recurrent"),
            ("forward_lstm/bias", "lstm_fwd.bias"),
            ("backward_lstm/kernel", "lstm_bwd.kernel"),
            ("backward_lstm/recurrent_kernel", "lstm_bwd.recurrent"),
            ("backward_lstm/bias", "lstm_bwd.bias"),
        ])
        add_layer("time_distributed", [("dense/kernel", "dense1.kernel"),
                                       ("dense/bias", "dense1.bias")])
        add_layer("frame", [("dense_1/kernel", "frame.kernel"),
                            ("dense_1/bias", "frame.bias")])
        add_layer("avg", [])
        mw.attrs["layer_names"] = layers
        opt = f.create_group("optimizer_weights")
        opt.create_dataset("Adam/iter:0", data=np.int64(7))


def test_keras_h5_import_roundtrip(tmp_path):
    params = mosnet.init_mosnet_params(3)
    path = tmp_path / "mosnet.h5"
    _write_keras_h5(path, params)
    loaded = mosnet.from_keras_h5(str(path))
    assert set(loaded) == set(params)
    for k in params:
        np.testing.assert_array_equal(loaded[k], params[k])


def test_h5_without_layer_names_is_rejected(tmp_path):
    """A .h5 lacking Keras ordering attrs must error, not fall back to the
    alphabetical visit order (same-shape fwd/bwd LSTM weights would pass the
    shape check misordered — ADVICE r2 #2)."""
    import h5py

    params = mosnet.init_mosnet_params(0)
    path = tmp_path / "bare.h5"
    with h5py.File(path, "w") as f:
        for i, (name, _) in enumerate(mosnet._param_slots()):
            f.create_dataset(f"w{i:02d}_{name.replace('.', '_')}",
                             data=params[name])
    with pytest.raises(ValueError, match="layer_names"):
        mosnet.from_keras_h5(str(path))


def test_predict_mos_native_end_to_end(tmp_path):
    from td_vc_gan_tpu.data.audio_io import write_audio
    from td_vc_gan_tpu.eval import mosnet as eval_mosnet
    from td_vc_gan_tpu.eval.mcd import parse_fn

    rng = np.random.default_rng(4)
    names = ["p1-s1-s2-conv.wav", "p1-s1-X-orig.wav"]
    for name in names:
        write_audio(tmp_path / name,
                    0.1 * rng.standard_normal(8000).astype(np.float32), 16000)
    ckpt = tmp_path / "w.npz"
    np.savez(ckpt, **mosnet.init_mosnet_params(5))
    res = eval_mosnet.predict_mos_native(tmp_path, str(ckpt))
    assert res["backend"] == "native" and res["n"] == 2
    assert np.isfinite(res["mean_mos"])
    mats = eval_mosnet.to_matrices(res["scores"], parse_fn)
    assert "s1" in mats["mos_result_conv"]
    assert "s2" in mats["mos_result_conv"]["s1"]
    assert "s1" in mats["mos_result_orig"]


def test_to_matrices_skips_unknown_kinds():
    """Kinds other than conv/orig (possible under --parse_regex, e.g. 'ref')
    must be out of scope like eval.mcd.scan_wavs — not counted as originals."""
    from td_vc_gan_tpu.eval import mosnet as eval_mosnet

    def parse(name):
        sig, src, tgt, kind = name[:-4].split("-")
        return sig, src, tgt, kind

    scores = {"p1-s1-s2-conv.wav": 3.0, "p1-s1-X-orig.wav": 4.0,
              "p1-s1-X-ref.wav": 1.0}
    mats = eval_mosnet.to_matrices(scores, parse)
    assert mats["mos_result_conv"] == {"s1": {"s2": [3.0]}}
    assert mats["mos_result_orig"] == {"s1": [4.0]}
