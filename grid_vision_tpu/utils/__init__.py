"""Utilities: stats/tracing, checkpointing, visualization helpers."""
