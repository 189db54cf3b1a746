"""Jitted training drivers (the TPU replacements for the reference's
train_*.py argparse scripts)."""
