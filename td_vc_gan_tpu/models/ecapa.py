"""ECAPA-TDNN speaker embedder (JAX) + speechbrain checkpoint importer.

The reference's speaker-verification harness loads a speechbrain ECAPA-TDNN
classifier (test_scripts/vctk/speechbrain_model/sb_classifier_hparams.yaml:
input 80 fbanks, channels [1024,1024,1024,1024,3072], kernels [5,3,3,3,1],
dilations [1,2,3,4,1], attention 128, 192-d embeddings; used from
test_scripts/common/test_speaker_rec.py:32-96). This is a from-scratch JAX
re-implementation of that architecture (Desplanques et al., ECAPA-TDNN),
evaluated in inference mode:

- TDNNBlock  = reflect-padded dilated conv -> ReLU -> BatchNorm (running
  stats), matching speechbrain's Conv1d(padding="same", reflect) + order.
- SERes2NetBlock = 1x1 TDNN -> Res2Net (scale 8) -> 1x1 TDNN -> SE, +res.
- Multi-layer feature aggregation (concat of the three SE blocks) -> 1x1
  TDNN -> attentive statistics pooling (global context) -> BN -> 1x1 conv
  to 192.
- Classifier head = cosine(normalized emb, normalized class weights).

Parameters live in a flat dict keyed EXACTLY like speechbrain's torch state
dict (``blocks.0.conv.conv.weight`` ...), so ``from_torch_state_dict`` is a
pure layout conversion — torch conv (out, in, k) -> NWC (k, in, out). Parity
vs a torch replica: tests/test_ecapa.py.

Everything is channels-last (B, T, C) and jit-compiled once per input
bucket, per the repo's TPU conventions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

CHANNELS = (1024, 1024, 1024, 1024, 3072)
KERNELS = (5, 3, 3, 3, 1)
DILATIONS = (1, 2, 3, 4, 1)
ATTENTION_CHANNELS = 128
LIN_NEURONS = 192
RES2NET_SCALE = 8
SE_CHANNELS = 128
BN_EPS = 1e-5


# ---------------------------------------------------------------------------
# building blocks (params: flat dict of speechbrain-keyed arrays)
# ---------------------------------------------------------------------------


def _conv1d(x, w, b, dilation: int = 1):
    """Reflect-'same' dilated conv; x (B, T, C_in), w (k, C_in, C_out)."""
    k = w.shape[0]
    pad = dilation * (k - 1) // 2
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding="VALID",
        rhs_dilation=(dilation,), dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return y + b if b is not None else y


def _bn(x, p, prefix):
    mean = p[f"{prefix}.running_mean"]
    var = p[f"{prefix}.running_var"]
    g = p[f"{prefix}.weight"]
    b = p[f"{prefix}.bias"]
    return (x - mean) * jax.lax.rsqrt(var + BN_EPS) * g + b


def _tdnn(p, prefix, x, dilation: int = 1):
    x = _conv1d(x, p[f"{prefix}.conv.conv.weight"],
                p.get(f"{prefix}.conv.conv.bias"), dilation)
    return _bn(jax.nn.relu(x), p, f"{prefix}.norm.norm")


def _res2net(p, prefix, x, dilation: int, scale: int = RES2NET_SCALE):
    chunks = jnp.split(x, scale, axis=-1)
    ys = [chunks[0]]
    y = None
    for i in range(1, scale):
        xi = chunks[i] if i == 1 else chunks[i] + y
        y = _tdnn(p, f"{prefix}.blocks.{i - 1}", xi, dilation)
        ys.append(y)
    return jnp.concatenate(ys, axis=-1)


def _se(p, prefix, x):
    s = x.mean(axis=1, keepdims=True)
    s = jax.nn.relu(_conv1d(s, p[f"{prefix}.conv1.conv.weight"],
                            p[f"{prefix}.conv1.conv.bias"]))
    s = jax.nn.sigmoid(_conv1d(s, p[f"{prefix}.conv2.conv.weight"],
                               p[f"{prefix}.conv2.conv.bias"]))
    return s * x


def _se_res2net(p, prefix, x, dilation: int, scale: int = RES2NET_SCALE):
    residual = x
    y = _tdnn(p, f"{prefix}.tdnn1", x)
    y = _res2net(p, f"{prefix}.res2net_block", y, dilation, scale)
    y = _tdnn(p, f"{prefix}.tdnn2", y)
    y = _se(p, f"{prefix}.se_block", y)
    return y + residual


def _asp(p, x, eps: float = 1e-12):
    """Attentive statistics pooling with global context -> (B, 2C)."""
    mean = x.mean(axis=1, keepdims=True)
    std = jnp.sqrt(jnp.clip((x**2).mean(axis=1, keepdims=True) - mean**2, eps))
    t = x.shape[1]
    attn = jnp.concatenate(
        [x, jnp.broadcast_to(mean, x.shape), jnp.broadcast_to(std, x.shape)],
        axis=-1,
    )
    attn = _tdnn(p, "asp.tdnn", attn)
    attn = _conv1d(jnp.tanh(attn), p["asp.conv.conv.weight"],
                   p["asp.conv.conv.bias"])
    attn = jax.nn.softmax(attn, axis=1)
    mean_w = jnp.sum(attn * x, axis=1)
    std_w = jnp.sqrt(jnp.clip(jnp.sum(attn * x**2, axis=1) - mean_w**2, eps))
    return jnp.concatenate([mean_w, std_w], axis=-1)


def ecapa_forward(params, feats, *, dilations=DILATIONS, scale=RES2NET_SCALE):
    """feats (B, T, n_mels) -> L2-unnormalized embeddings (B, lin_neurons)."""
    x = _tdnn(params, "blocks.0", feats, dilations[0])
    taps = []
    for i in range(1, len(dilations) - 1):
        x = _se_res2net(params, f"blocks.{i}", x, dilations[i], scale)
        taps.append(x)
    x = jnp.concatenate(taps, axis=-1)
    x = _tdnn(params, "mfa", x, dilations[-1])
    pooled = _asp(params, x)
    pooled = _bn(pooled[:, None, :], params, "asp_bn.norm")[:, 0]
    emb = _conv1d(pooled[:, None, :], params["fc.conv.weight"],
                  params["fc.conv.bias"])[:, 0]
    return emb


def classify(params, emb):
    """Cosine-similarity logits vs the AAM class weights (speechbrain
    Classifier.forward)."""
    w = params["classifier.weight"]  # (n_classes, lin_neurons)
    e = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-12)
    wn = w / (jnp.linalg.norm(w, axis=-1, keepdims=True) + 1e-12)
    return e @ wn.T


# ---------------------------------------------------------------------------
# init / import
# ---------------------------------------------------------------------------


def _torch_key_shapes(input_size=80, channels=CHANNELS, kernels=KERNELS,
                      attention_channels=ATTENTION_CHANNELS,
                      lin_neurons=LIN_NEURONS, scale=RES2NET_SCALE,
                      se_channels=SE_CHANNELS) -> dict:
    """speechbrain embedding-model state-dict layout: key -> torch shape."""
    shapes: dict[str, tuple] = {}

    def conv(prefix, cin, cout, k):
        shapes[f"{prefix}.conv.weight"] = (cout, cin, k)
        shapes[f"{prefix}.conv.bias"] = (cout,)

    def bn(prefix, c):
        for name, shp in (("weight", (c,)), ("bias", (c,)),
                          ("running_mean", (c,)), ("running_var", (c,))):
            shapes[f"{prefix}.{name}"] = shp

    def tdnn(prefix, cin, cout, k):
        conv(f"{prefix}.conv", cin, cout, k)
        bn(f"{prefix}.norm.norm", cout)

    tdnn("blocks.0", input_size, channels[0], kernels[0])
    hidden = channels[0] // scale
    for i in range(1, len(channels) - 1):
        tdnn(f"blocks.{i}.tdnn1", channels[i - 1], channels[i], 1)
        for j in range(scale - 1):
            tdnn(f"blocks.{i}.res2net_block.blocks.{j}", hidden, hidden, kernels[i])
        tdnn(f"blocks.{i}.tdnn2", channels[i], channels[i], 1)
        conv(f"blocks.{i}.se_block.conv1", channels[i], se_channels, 1)
        conv(f"blocks.{i}.se_block.conv2", se_channels, channels[i], 1)
    cat = channels[-2] * (len(channels) - 2)
    tdnn("mfa", cat, channels[-1], kernels[-1])
    tdnn("asp.tdnn", channels[-1] * 3, attention_channels, 1)
    conv("asp.conv", attention_channels, channels[-1], 1)
    bn("asp_bn.norm", channels[-1] * 2)
    conv("fc", channels[-1] * 2, lin_neurons, 1)
    return shapes


def from_torch_state_dict(state_dict, classifier_state_dict=None, **cfg) -> dict:
    """speechbrain embedding_model.ckpt state dict -> forward params.

    Conv weights (out, in, k) -> (k, in, out); everything else verbatim.
    Raises on missing keys so a wrong checkpoint fails loudly. ``cfg``
    overrides the architecture (see :func:`_torch_key_shapes`) for
    non-default ECAPA sizes.
    """
    params: dict = {}
    expected = _torch_key_shapes(**cfg)
    for key, shape in expected.items():
        if key not in state_dict:
            raise KeyError(f"ECAPA checkpoint missing '{key}'")
        t = np.asarray(state_dict[key], dtype=np.float32)
        if tuple(t.shape) != tuple(shape):
            raise ValueError(f"'{key}': expected {shape}, got {t.shape}")
        if key.endswith("conv.weight") and t.ndim == 3:
            t = np.transpose(t, (2, 1, 0))
        params[key] = jnp.asarray(t)
    if classifier_state_dict is not None:
        w = classifier_state_dict.get("weight")
        if w is None:  # speechbrain saves the AAM weight as 'weight'
            raise KeyError("classifier checkpoint missing 'weight'")
        params["classifier.weight"] = jnp.asarray(np.asarray(w, np.float32))
    return params


def init_ecapa_params(rng: np.random.Generator | int = 0, **kwargs) -> dict:
    """Random torch-layout state dict (for tests / weightless smoke runs)."""
    rng = np.random.default_rng(rng) if isinstance(rng, int) else rng
    sd = {}
    for key, shape in _torch_key_shapes(**kwargs).items():
        if key.endswith("running_var"):
            sd[key] = np.ones(shape, np.float32)
        elif key.endswith("running_mean") or key.endswith(".bias"):
            sd[key] = np.zeros(shape, np.float32)
        elif key.endswith("norm.weight") and len(shape) == 1:
            sd[key] = np.ones(shape, np.float32)
        else:
            fan_in = int(np.prod(shape[1:])) if len(shape) > 1 else shape[0]
            sd[key] = (rng.standard_normal(shape) / np.sqrt(fan_in)).astype(
                np.float32
            )
    return sd


# ---------------------------------------------------------------------------
# features + end-user embedder
# ---------------------------------------------------------------------------


def fbank(wav: np.ndarray, sr: int = 16000, n_mels: int = 80,
          n_fft: int = 400, hop: int = 160) -> np.ndarray:
    """80-dim log-mel features, speechbrain Fbank conventions (25 ms Hamming
    window, 10 ms hop, power spectrum, HTK mel scale, 10*log10 with amin)."""
    from td_vc_gan_tpu.ops.stft import mel_filterbank

    wav = np.asarray(wav, dtype=np.float32)
    n = max(0, (len(wav) - n_fft) // hop + 1)
    if n == 0:
        wav = np.pad(wav, (0, n_fft - len(wav)))
        n = 1
    idx = np.arange(n)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = wav[idx] * np.hamming(n_fft).astype(np.float32)
    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    fb = np.asarray(mel_filterbank(sr, n_fft, n_mels))  # (n_freqs, n_mels)
    mel = power @ fb
    return (10.0 * np.log10(np.maximum(mel, 1e-10))).astype(np.float32)


class EcapaEmbedder:
    """wav -> 192-d speaker embedding, with per-sentence feature mean-norm
    (speechbrain InputNormalization norm_type=sentence, std_norm=False)."""

    BUCKET = 200  # frames; inputs pad to multiples to bound recompiles

    def __init__(self, params: dict, sr: int = 16000):
        self.params = params
        self.sr = sr
        self._fwd = functools.lru_cache(maxsize=16)(self._make_fwd)

    def _make_fwd(self, n_frames: int):
        @jax.jit
        def fwd(params, feats):
            return ecapa_forward(params, feats)

        return fwd

    @classmethod
    def from_speechbrain(cls, checkpoint: str, classifier: str | None = None,
                         sr: int = 16000) -> "EcapaEmbedder":
        import torch

        sd = torch.load(checkpoint, map_location="cpu", weights_only=True)
        csd = (torch.load(classifier, map_location="cpu", weights_only=True)
               if classifier else None)
        to_np = lambda d: {k: v.numpy() for k, v in d.items()}  # noqa: E731
        return cls(from_torch_state_dict(to_np(sd), to_np(csd) if csd else None), sr)

    def embed(self, wav: np.ndarray) -> np.ndarray:
        feats = fbank(wav, self.sr)
        feats = feats - feats.mean(axis=0, keepdims=True)
        n = feats.shape[0]
        padded = -(-n // self.BUCKET) * self.BUCKET
        if padded != n:  # repeat-pad so statistics pooling sees real frames
            reps = -(-padded // n)
            feats = np.tile(feats, (reps, 1))[:padded]
        emb = self._fwd(feats.shape[0])(self.params, jnp.asarray(feats[None]))
        return np.asarray(emb[0])
