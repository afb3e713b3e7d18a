"""ECAPA-TDNN parity: JAX forward vs a torch replica of speechbrain's
ECAPA_TDNN (lobes/models/ECAPA_TDNN.py), fed identical features and the
identical (torch-layout) state dict through the importer."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from td_vc_gan_tpu.models import ecapa  # noqa: E402

# small config so the test runs in seconds
CFG = dict(input_size=8, channels=(16, 16, 16, 16, 48), kernels=(5, 3, 3, 3, 1),
           attention_channels=8, lin_neurons=12, scale=4, se_channels=8)
DILATIONS = (1, 2, 3, 4, 1)


def _t(sd, key):
    return torch.from_numpy(np.asarray(sd[key], np.float32))


def _conv_reflect(x, sd, prefix, dilation=1):
    """speechbrain Conv1d: reflect 'same' padding; x (B, C, T)."""
    w, b = _t(sd, f"{prefix}.conv.weight"), _t(sd, f"{prefix}.conv.bias")
    k = w.shape[-1]
    pad = dilation * (k - 1) // 2
    if pad:
        x = torch.nn.functional.pad(x, (pad, pad), mode="reflect")
    return torch.nn.functional.conv1d(x, w, b, dilation=dilation)


def _bn_eval(x, sd, prefix):
    return torch.nn.functional.batch_norm(
        x, _t(sd, f"{prefix}.running_mean"), _t(sd, f"{prefix}.running_var"),
        _t(sd, f"{prefix}.weight"), _t(sd, f"{prefix}.bias"),
        training=False, eps=1e-5,
    )


def _tdnn(x, sd, prefix, dilation=1):
    return _bn_eval(torch.relu(_conv_reflect(x, sd, f"{prefix}.conv", dilation)),
                    sd, f"{prefix}.norm.norm")


def _res2net(x, sd, prefix, dilation, scale):
    chunks = torch.chunk(x, scale, dim=1)
    ys = [chunks[0]]
    y = None
    for i in range(1, scale):
        xi = chunks[i] if i == 1 else chunks[i] + y
        y = _tdnn(xi, sd, f"{prefix}.blocks.{i - 1}", dilation)
        ys.append(y)
    return torch.cat(ys, dim=1)


def _se(x, sd, prefix):
    s = x.mean(dim=2, keepdim=True)
    s = torch.relu(_conv_reflect(s, sd, f"{prefix}.conv1"))
    s = torch.sigmoid(_conv_reflect(s, sd, f"{prefix}.conv2"))
    return s * x


def _se_res2net(x, sd, prefix, dilation, scale):
    res = x
    y = _tdnn(x, sd, f"{prefix}.tdnn1")
    y = _res2net(y, sd, f"{prefix}.res2net_block", dilation, scale)
    y = _tdnn(y, sd, f"{prefix}.tdnn2")
    return _se(y, sd, f"{prefix}.se_block") + res


def torch_ecapa(sd, feats, scale):
    """feats (B, T, F) -> (B, lin_neurons), speechbrain forward order."""
    x = torch.from_numpy(feats).transpose(1, 2)
    x = _tdnn(x, sd, "blocks.0", DILATIONS[0])
    taps = []
    for i in range(1, len(DILATIONS) - 1):
        x = _se_res2net(x, sd, f"blocks.{i}", DILATIONS[i], scale)
        taps.append(x)
    x = torch.cat(taps, dim=1)
    x = _tdnn(x, sd, "mfa", DILATIONS[-1])

    # attentive statistics pooling, global context
    eps = 1e-12
    mean = x.mean(dim=2, keepdim=True)
    std = torch.sqrt(torch.clamp((x**2).mean(dim=2, keepdim=True) - mean**2, eps))
    t = x.shape[2]
    attn = torch.cat([x, mean.expand(-1, -1, t), std.expand(-1, -1, t)], dim=1)
    attn = _tdnn(attn, sd, "asp.tdnn")
    attn = _conv_reflect(torch.tanh(attn), sd, "asp.conv")
    attn = torch.softmax(attn, dim=2)
    mean_w = (attn * x).sum(dim=2)
    std_w = torch.sqrt(torch.clamp((attn * x**2).sum(dim=2) - mean_w**2, eps))
    pooled = torch.cat([mean_w, std_w], dim=1).unsqueeze(2)

    pooled = _bn_eval(pooled, sd, "asp_bn.norm")
    w, b = _t(sd, "fc.conv.weight"), _t(sd, "fc.conv.bias")
    return torch.nn.functional.conv1d(pooled, w, b).squeeze(2)


class TestEcapaParity:
    def test_forward_matches_torch_replica(self, rng):
        sd = ecapa.init_ecapa_params(3, **CFG)
        # realistic BN stats so normalization is a real transform
        for k in sd:
            if k.endswith("running_mean"):
                sd[k] = rng.standard_normal(sd[k].shape).astype(np.float32) * 0.1
            if k.endswith("running_var"):
                sd[k] = (0.5 + rng.random(sd[k].shape)).astype(np.float32)

        feats = rng.standard_normal((2, 50, CFG["input_size"])).astype(np.float32)
        ref = torch_ecapa(sd, feats, CFG["scale"]).numpy()

        params = ecapa.from_torch_state_dict(sd, **CFG)
        out = np.asarray(ecapa.ecapa_forward(params, feats, scale=CFG["scale"]))
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)

    def test_importer_rejects_wrong_size(self, tmp_path):
        # a small-config state dict is NOT the speechbrain layout; the
        # importer must fail loudly rather than silently mis-map
        sd = {k: torch.from_numpy(v) for k, v in
              ecapa.init_ecapa_params(5, **CFG).items()}
        torch.save(sd, tmp_path / "embedding_model.ckpt")
        with pytest.raises((KeyError, ValueError)):
            ecapa.EcapaEmbedder.from_speechbrain(str(tmp_path / "embedding_model.ckpt"))

    def test_importer_rejects_wrong_layout(self, tmp_path):
        torch.save({"not_a_real_key": torch.zeros(3)}, tmp_path / "bad.ckpt")
        with pytest.raises(KeyError):
            ecapa.EcapaEmbedder.from_speechbrain(str(tmp_path / "bad.ckpt"))

    def test_full_size_state_dict_imports_and_embeds(self, tmp_path, rng):
        sd = {k: torch.from_numpy(v) for k, v in ecapa.init_ecapa_params(7).items()}
        torch.save(sd, tmp_path / "embedding_model.ckpt")
        emb = ecapa.EcapaEmbedder.from_speechbrain(str(tmp_path / "embedding_model.ckpt"))
        assert emb is not None

    def test_classifier_cosine_logits(self, rng):
        w = rng.standard_normal((5, 12)).astype(np.float32)
        params = {"classifier.weight": w}
        e = rng.standard_normal((2, 12)).astype(np.float32)
        logits = np.asarray(ecapa.classify(params, e))
        en = e / np.linalg.norm(e, axis=1, keepdims=True)
        wn = w / np.linalg.norm(w, axis=1, keepdims=True)
        np.testing.assert_allclose(logits, en @ wn.T, rtol=1e-5, atol=1e-5)
