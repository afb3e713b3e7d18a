"""Small conv F0+voicing predictor (model/f0_estimator.py:5-47).

Dead code in the reference trainer (imported at train.py:25 but never
instantiated — CREPE supplanted it); provided for component parity.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from td_vc_gan_tpu.models.layers import WNConv1d, leaky_relu


class F0Estimator(nn.Module):
    num_layers: int = 3
    stride: int = 4
    base_channels: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """x: (B, T, 1) -> (f0 (B, T', 1), voiced (B, T', 1))."""
        nf = self.base_channels
        x = leaky_relu(WNConv1d(nf, 15, padding=7, pad_mode="reflect", name="input")(x))
        s = self.stride
        for i in range(self.num_layers):
            nf_prev, nf = nf, nf * 2
            x = leaky_relu(
                WNConv1d(nf, s * 10 + 1, stride=s, padding=s * 5, groups=nf_prev, name=f"down_{i}")(x)
            )
        x = leaky_relu(WNConv1d(nf, 5, padding=2, name="pre_out")(x))
        voiced = jax.nn.sigmoid(WNConv1d(1, 3, padding=1, use_bias=False, name="out_voiced")(x))
        f0 = WNConv1d(1, 3, padding=1, use_bias=False, name="out_f0")(x)
        return f0, voiced
