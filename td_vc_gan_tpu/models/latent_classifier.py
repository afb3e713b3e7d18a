"""Adversarial speaker probe on the content embedding.

Re-design of model/latent_classifier.py:8-38: gradient reversal at the input,
then a strided weight-normed conv stack ending in per-class logits with global
average pooling over time. The gradient-reversal makes the *encoder* remove
speaker identity while the probe itself learns to find it.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from td_vc_gan_tpu.models.layers import (
    WNConv1d,
    finalize_dtype,
    grad_reverse,
    leaky_relu,
)


class LatentClassifier(nn.Module):
    num_classes: int
    num_layers: int = 3
    num_channel_mult: int = 2
    downsampling_factor: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, T, C) content embedding -> (B, num_classes) logits."""
        x = grad_reverse(x)
        nf = x.shape[-1]
        ds = self.downsampling_factor
        for i in range(self.num_layers):
            nf = nf * self.num_channel_mult
            x = leaky_relu(
                WNConv1d(nf, ds * 10 + 1, stride=ds, padding=ds * 5, name=f"down_{i}")(x)
            )
        x = leaky_relu(WNConv1d(nf, 5, padding=2, name="pre_out")(x))
        x = WNConv1d(self.num_classes, 3, padding=1, use_bias=False, name="output")(x)
        return jnp.mean(finalize_dtype(x), axis=1)  # time-mean in f32
