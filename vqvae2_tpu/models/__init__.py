"""Model zoo (flax linen, NHWC, TPU-first)."""

from vqvae2_tpu.models.vqvae import VQVAE, Decoder, Encoder, Quantize, ResBlock  # noqa: F401
