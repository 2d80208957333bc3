"""Training: jitted SPMD update step, loop, checkpointing, metrics."""
