"""Evaluation: ReID retrieval metrics (CMC/mAP/mINP), k-reciprocal re-ranking."""
