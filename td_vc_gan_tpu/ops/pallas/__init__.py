"""Pallas TPU kernels for the profiled hot ops.

Status after honest on-chip A/Bs (round 3): the train step is HBM-bound, and
every first-party kernel candidate for the FiLM cond chain lost to XLA's own
formulation once the chain was wrapped in an explicit jax.checkpoint — see
cond_chain.py's docstring for the measurements and the reasons. The fused
chain kernel stays available behind TDVC_FUSED_COND=1 as the documented
measured alternative.
"""

from td_vc_gan_tpu.ops.pallas.cond_chain import film_cond_chain  # noqa: F401
