"""Pallas TPU kernels for the profiled hot ops."""

from td_vc_gan_tpu.ops.pallas.film_block import fused_film_block  # noqa: F401
