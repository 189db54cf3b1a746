"""vqvae2_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework with the
capabilities of alehdaghi/vq-vae-2-pytorch.

Layout (mirrors SURVEY.md §1 layer map, redesigned TPU-first):

- :mod:`vqvae2_tpu.ops`      — fused TPU ops (Pallas quantizer, inplace-ABN, causal convs)
- :mod:`vqvae2_tpu.models`   — flax model zoo (VQVAE, VQVAE_Deep, PixelSNAIL, ReID nets, StarGAN-v2)
- :mod:`vqvae2_tpu.parallel` — SPMD mesh / collectives layer (replaces reference `distributed/`)
- :mod:`vqvae2_tpu.data`     — datasets, samplers, code stores (replaces LMDB + SYSU loaders)
- :mod:`vqvae2_tpu.train`    — jitted training drivers (replaces the train_*.py scripts)
- :mod:`vqvae2_tpu.eval`     — ReID CMC/mAP/mINP + re-ranking, detection eval
- :mod:`vqvae2_tpu.utils`    — schedules, checkpointing, metrics, config
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache (12 s -> 1.2 s first-step wall in a fresh
# process for the stage-1 train step; the win is 10-40 MINUTES on stage-2
# graphs through the remote-compile helper). Opt out:
# VQVAE2_TPU_NO_COMPILE_CACHE=1. See utils/compile_cache.py.
from vqvae2_tpu.utils import compile_cache as _compile_cache

_compile_cache.enable()
del _compile_cache
