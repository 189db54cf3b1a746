"""Fused TPU ops (Pallas kernels + XLA reference paths)."""

from vqvae2_tpu.ops.inplace_abn import (  # noqa: F401
    ACT_ELU,
    ACT_LEAKY_RELU,
    ACT_NONE,
    batch_moments,
    inplace_abn,
)
from vqvae2_tpu.ops.quantize import (  # noqa: F401
    nearest_code,
    nearest_code_reference,
    quantize_lookup,
)
