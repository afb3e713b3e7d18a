"""Flax model zoo: generator, discriminators, classifiers, pitch nets.

All modules use channels-last (B, T, C) layout — time in sublanes, channels in
lanes — which is the natural TPU mapping for 1-D convolution (XLA tiles the
implied matmuls onto the MXU).
"""

from td_vc_gan_tpu.models.generator import Decoder, Encoder, Generator  # noqa: F401
from td_vc_gan_tpu.models.discriminator import (  # noqa: F401
    CollaborativeMultibandDiscriminator,
    Discriminator,
    MultiscaleDiscriminator,
)
from td_vc_gan_tpu.models.latent_classifier import LatentClassifier  # noqa: F401
