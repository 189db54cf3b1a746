"""Fused TPU ops (Pallas kernels + XLA reference paths)."""

from vqvae2_tpu.ops.quantize import (  # noqa: F401
    nearest_code,
    nearest_code_reference,
    quantize_lookup,
)
