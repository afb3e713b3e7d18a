"""Device-mesh parallelism: mesh construction, sharding rules, multi-host.

The reference is single-process/single-GPU (SURVEY.md §2.10: no
torch.distributed/NCCL anywhere). Here data parallelism is first-class:
a 1-D ('data',) mesh over ICI, batches sharded on axis 0, parameters
replicated, gradients all-reduced by the psum XLA inserts under jit; multi-
host pods join over DCN via jax.distributed.initialize with per-host input
sharding.
"""

from td_vc_gan_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    batch_sharding,
    create_mesh,
    initialize_multihost,
    put_tree,
    replicate_tree,
    replicated_sharding,
    shard_batch,
)
