"""Training runtime: losses, schedules, optimizers, SPMD train step."""
