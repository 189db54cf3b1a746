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
