"""Training: optimizers, train states, loops, checkpointing."""
