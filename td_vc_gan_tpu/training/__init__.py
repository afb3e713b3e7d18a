"""Training subsystem: fused GAN train step, state, checkpointing, loop."""
