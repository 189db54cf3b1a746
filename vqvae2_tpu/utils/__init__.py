"""Utilities: LR schedules, checkpointing, metrics, image grids, config."""
