"""Utilities: checkpointing (Orbax + transforms), HF weight import,
profiling helpers."""
