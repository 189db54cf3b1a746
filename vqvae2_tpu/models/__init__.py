"""Model zoo (flax linen, NHWC, TPU-first)."""

from vqvae2_tpu.models.vqvae import VQVAE, Decoder, Encoder, Quantize, ResBlock  # noqa: F401
from vqvae2_tpu.models.vqvae_deep import VQVAE_Deep  # noqa: F401
from vqvae2_tpu.models.pixelsnail import PixelSNAIL  # noqa: F401
from vqvae2_tpu.models.sampling import sample_prior  # noqa: F401
from vqvae2_tpu.models.incremental import sample_prior_incremental  # noqa: F401
from vqvae2_tpu.models.embed_net import EmbedNet  # noqa: F401
from vqvae2_tpu.models.adaptive import (  # noqa: F401
    ModelAdaptive,
    ModelAdaptive_Deep,
    ModelAdaptiveBi_Deep,
)
from vqvae2_tpu.models.stargan import ModelStarGAN  # noqa: F401
