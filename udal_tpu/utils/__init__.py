"""Shared utilities: checkpointing, logging, profiling."""
