"""Import third-party pretrained torch weights (CREPE, WavLM).

These are weight *ports*, not code ports: the nets are re-implemented in
td_vc_gan_tpu.models and only the tensors are mapped. Files are optional —
every pipeline runs with random initialization when the checkpoints are
absent (this image has neither torchcrepe nor WavLM-Large.pt).
"""

from __future__ import annotations

import numpy as np


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def load_torchcrepe(path) -> dict:
    """torchcrepe ``tiny.pth``/``full.pth`` -> models.crepe.Crepe params.

    torchcrepe layout: conv{1..6}.weight (out, in, k, 1), conv{1..6}.bias,
    conv{1..6}_BN.{weight,bias,running_mean,running_var}, classifier.{weight,bias}.
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    params: dict = {}
    for i in range(6):
        t = i + 1
        w = _np(sd[f"conv{t}.weight"])[..., 0]  # (out, in, k)
        params[f"conv{i}_kernel"] = w.transpose(2, 1, 0)
        params[f"conv{i}_bias"] = _np(sd[f"conv{t}.bias"])
        params[f"bn{i}"] = {
            "scale": _np(sd[f"conv{t}_BN.weight"]),
            "bias": _np(sd[f"conv{t}_BN.bias"]),
            "mean": _np(sd[f"conv{t}_BN.running_mean"]),
            "var": _np(sd[f"conv{t}_BN.running_var"]),
        }
    params["classifier_kernel"] = _np(sd["classifier.weight"]).T
    params["classifier_bias"] = _np(sd["classifier.bias"])
    return {"params": params}
