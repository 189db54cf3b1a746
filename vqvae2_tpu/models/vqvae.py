"""Hierarchical VQ-VAE-2 (TPU-native redesign of reference ``vqvae.py``).

Design notes vs the reference:

* **NHWC throughout.** The reference is NCHW and permutes to NHWC around the
  quantizer (``vqvae.py:227-237``); on TPU NHWC is the native conv layout, so
  there are no permutes anywhere.
* **Quantizer state is explicit.** The reference mutates ``embed`` /
  ``cluster_size`` / ``embed_avg`` buffers in place under ``self.training``
  (``vqvae.py:37-40,54-70``).  Here they live in a flax ``"vq_stats"``
  variable collection (buffers, not parameters — same as the reference) and
  the train step threads them functionally via ``mutable=["vq_stats"]``.
* **Cross-device EMA sync.** The reference all-reduces the one-hot counts and
  sums (``vqvae.py:58-59``).  Under GSPMD, summing over the batch axis of a
  sharded array compiles to the identical all-reduce automatically; under
  shard_map pass ``axis_name="data"`` and the module psums explicitly.
* **The distance search is a fused Pallas kernel** (:mod:`vqvae2_tpu.ops.quantize`).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vqvae2_tpu.ops.quantize import (nearest_code, nearest_code_ids,
                                     quantize_lookup)

Dtype = Any


class Quantize(nn.Module):
    """EMA vector quantizer (reference ``Quantize``, ``vqvae.py:28-78``).

    Attributes mirror the reference init args (``vqvae.py:29-40``):
    ``dim`` (code dim), ``n_embed`` (codebook size), ``decay`` (EMA decay,
    0.99), ``eps`` (Laplace smoothing, 1e-5).
    """

    dim: int
    n_embed: int = 512
    decay: float = 0.99
    eps: float = 1e-5
    axis_name: Optional[str] = None  # set under shard_map; None under GSPMD
    # Beyond-parity option (PAPERS.md codebook-collapse literature): when >0,
    # codes whose EMA cluster_size falls below the threshold are re-seeded
    # from random batch vectors each training step, keeping utilization high.
    restart_threshold: float = 0.0

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Args: ``x`` — ``(..., dim)`` NHWC features.

        Returns ``(quantized, diff, indices)`` exactly like the reference
        forward (``vqvae.py:42-75``): straight-through quantized output,
        commitment loss, and integer code indices of shape ``x.shape[:-1]``.
        """
        # Buffers, not parameters (reference registers buffers, vqvae.py:37-40).
        # Reference stores embed as (dim, n_embed); we use (n_embed, dim) —
        # the natural row-major layout for the Pallas tile loop.
        embed_init = nn.initializers.normal(stddev=1.0)
        embed = self.variable(
            "vq_stats", "embed",
            lambda k: embed_init(k, (self.n_embed, self.dim), jnp.float32),
            self.make_rng("params") if self.is_initializing() else None,
        )
        cluster_size = self.variable(
            "vq_stats", "cluster_size", lambda: jnp.zeros((self.n_embed,), jnp.float32)
        )
        embed_avg = self.variable(
            "vq_stats", "embed_avg", lambda: embed.value.copy()
        )

        flat = x.reshape(-1, self.dim)
        with_stats = train and not self.is_initializing()
        indices, quantized, csum, esum = nearest_code(
            flat, embed.value, with_stats=with_stats)

        if with_stats:
            # codebook-health telemetry: perplexity of the code usage
            # distribution (exp entropy; n_embed = perfectly uniform usage).
            # Retrieved via mutable=["intermediates"]; absent from the return
            # signature to keep reference API parity.
            probs = csum / jnp.maximum(jnp.sum(csum), 1.0)
            perplexity = jnp.exp(-jnp.sum(
                probs * jnp.log(jnp.clip(probs, 1e-10, None))))
            self.sow("intermediates", "perplexity", perplexity)
        indices = indices.reshape(x.shape[:-1])
        quantized = quantized.reshape(x.shape).astype(x.dtype)

        if train and not self.is_initializing():
            # Cross-replica stat sync (reference all_reduce, vqvae.py:58-59).
            if self.axis_name is not None:
                csum = jax.lax.psum(csum, self.axis_name)
                esum = jax.lax.psum(esum, self.axis_name)
            # EMA update (vqvae.py:61-70), with Laplace smoothing.
            new_cluster = cluster_size.value * self.decay + (1 - self.decay) * csum
            new_avg = embed_avg.value * self.decay + (1 - self.decay) * esum
            n = jnp.sum(new_cluster)
            smoothed = (new_cluster + self.eps) / (n + self.n_embed * self.eps) * n
            new_embed = new_avg / smoothed[:, None]

            if self.restart_threshold > 0:
                # dead-code restart: re-seed rarely-used codes from batch
                # vectors (deterministic draw from the batch content)
                dead = new_cluster < self.restart_threshold
                take = jnp.arange(self.n_embed) % flat.shape[0]
                repl = jax.lax.stop_gradient(flat[take]).astype(jnp.float32)
                new_embed = jnp.where(dead[:, None], repl, new_embed)
                new_avg = jnp.where(dead[:, None], repl, new_avg)
                new_cluster = jnp.where(dead, jnp.ones_like(new_cluster),
                                        new_cluster)

            cluster_size.value = new_cluster
            embed_avg.value = new_avg
            embed.value = new_embed

        # Commitment loss + straight-through estimator (vqvae.py:72-73).
        diff = jnp.mean(
            jnp.square(jax.lax.stop_gradient(quantized).astype(jnp.float32)
                       - x.astype(jnp.float32))
        )
        quantized = x + jax.lax.stop_gradient(quantized - x)
        return quantized, diff, indices

    def embed_code(self, indices: jax.Array) -> jax.Array:
        """Codebook lookup (reference ``embed_code``, ``vqvae.py:77-78``)."""
        return quantize_lookup(indices, self.get_variable("vq_stats", "embed"))

    def codes(self, x: jax.Array) -> jax.Array:
        """Indices-only quantization (same argmin as ``__call__``): skips the
        quantized-vector lookup and EMA stat outputs for callers that consume
        only the integer codes (code extraction, the headline bench)."""
        flat = x.reshape(-1, self.dim)
        idx = nearest_code_ids(flat, self.get_variable("vq_stats", "embed"))
        return idx.reshape(x.shape[:-1])


class ResBlock(nn.Module):
    """ReLU→3×3→ReLU→1×1 + skip (reference ``ResBlock``, ``vqvae.py:81-96``)."""

    channel: int
    out_channel: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.relu(x)
        h = nn.Conv(self.channel, (3, 3), padding="SAME", dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(self.out_channel, (1, 1), dtype=self.dtype)(h)
        return x + h


class Encoder(nn.Module):
    """Strided conv encoder (reference ``Encoder``, ``vqvae.py:99-127``).

    ``stride`` ∈ {2, 4}: stride-4 = two 4×4/s2 convs; stride-2 = one.
    """

    channel: int = 128
    n_res_block: int = 2
    n_res_channel: int = 32
    stride: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c, dt = self.channel, self.dtype
        if self.stride == 4:
            x = nn.Conv(c // 2, (4, 4), strides=(2, 2), padding="SAME", dtype=dt)(x)
            x = nn.relu(x)
            x = nn.Conv(c, (4, 4), strides=(2, 2), padding="SAME", dtype=dt)(x)
            x = nn.relu(x)
            x = nn.Conv(c, (3, 3), padding="SAME", dtype=dt)(x)
        elif self.stride == 2:
            x = nn.Conv(c // 2, (4, 4), strides=(2, 2), padding="SAME", dtype=dt)(x)
            x = nn.relu(x)
            x = nn.Conv(c, (3, 3), padding="SAME", dtype=dt)(x)
        else:
            raise ValueError(f"unsupported stride {self.stride}")
        for _ in range(self.n_res_block):
            x = ResBlock(self.n_res_channel, c, dtype=dt)(x)
        return nn.relu(x)


class Decoder(nn.Module):
    """Transposed-conv decoder (reference ``Decoder``, ``vqvae.py:130-166``)."""

    out_channel: int
    channel: int = 128
    n_res_block: int = 2
    n_res_channel: int = 32
    stride: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c, dt = self.channel, self.dtype
        x = nn.Conv(c, (3, 3), padding="SAME", dtype=dt)(x)
        for _ in range(self.n_res_block):
            x = ResBlock(self.n_res_channel, c, dtype=dt)(x)
        x = nn.relu(x)
        if self.stride == 4:
            x = nn.ConvTranspose(c // 2, (4, 4), strides=(2, 2), padding="SAME", dtype=dt)(x)
            x = nn.relu(x)
            x = nn.ConvTranspose(self.out_channel, (4, 4), strides=(2, 2), padding="SAME", dtype=dt)(x)
        elif self.stride == 2:
            x = nn.ConvTranspose(self.out_channel, (4, 4), strides=(2, 2), padding="SAME", dtype=dt)(x)
        else:
            raise ValueError(f"unsupported stride {self.stride}")
        return x


class VQVAE(nn.Module):
    """Two-level hierarchical VQ-VAE (reference ``VQVAE``, ``vqvae.py:169-259``).

    Defaults match ``vqvae.py:170-179``: channel=128, n_res_block=2,
    n_res_channel=32, embed_dim=64, n_embed=512.  Includes the fork's extra
    1-channel IR decoder head (``dec_ir``, ``vqvae.py:203-210``).
    """

    in_channel: int = 3
    channel: int = 128
    n_res_block: int = 2
    n_res_channel: int = 32
    embed_dim: int = 64
    n_embed: int = 512
    decay: float = 0.99
    with_ir_head: bool = False
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None
    # rematerialize encoder/decoder activations in the backward pass — the
    # jax.checkpoint HBM-for-FLOPs trade for large batches/resolutions
    remat: bool = False
    # dead-code restart threshold for both quantizers (see Quantize) — off by
    # default for reference parity; small-batch runs collapse to one live
    # code for hundreds of steps without it
    restart_threshold: float = 0.0

    def setup(self):
        dt = self.dtype
        Enc = nn.remat(Encoder) if self.remat else Encoder
        Dec = nn.remat(Decoder) if self.remat else Decoder
        self.enc_b = Enc(self.channel, self.n_res_block, self.n_res_channel,
                         stride=4, dtype=dt)
        self.enc_t = Enc(self.channel, self.n_res_block, self.n_res_channel,
                         stride=2, dtype=dt)
        self.quantize_conv_t = nn.Conv(self.embed_dim, (1, 1), dtype=dt)
        self.quantize_t = Quantize(self.embed_dim, self.n_embed, self.decay,
                                   axis_name=self.axis_name,
                                   restart_threshold=self.restart_threshold)
        self.dec_t = Dec(self.embed_dim, self.channel, self.n_res_block,
                             self.n_res_channel, stride=2, dtype=dt)
        self.quantize_conv_b = nn.Conv(self.embed_dim, (1, 1), dtype=dt)
        self.quantize_b = Quantize(self.embed_dim, self.n_embed, self.decay,
                                   axis_name=self.axis_name,
                                   restart_threshold=self.restart_threshold)
        self.upsample_t = nn.ConvTranspose(self.embed_dim, (4, 4), strides=(2, 2),
                                           padding="SAME", dtype=dt)
        self.dec = Dec(self.in_channel, self.channel, self.n_res_block,
                           self.n_res_channel, stride=4, dtype=dt)
        if self.with_ir_head:
            # the fork's IR head is 2 res-blocks deeper (vqvae.py:203-210)
            self.dec_ir = Dec(1, self.channel, self.n_res_block + 2,
                                  self.n_res_channel, stride=4, dtype=dt)

    def __call__(self, x: jax.Array, train: bool = False):
        """Forward (reference ``vqvae.py:216-221``): returns ``(dec, diff)``."""
        quant_t, quant_b, diff, _, _ = self.encode(x, train=train)
        dec = self.decode(quant_t, quant_b)
        return dec, diff

    def forward_ir(self, x: jax.Array, train: bool = False):
        """Forward with the extra IR head: ``(dec, diff, dec_ir)`` — the
        3-tuple the fork's ModelAdaptive trainer consumes
        (``train_vqvae.py:72``; requires ``with_ir_head=True``)."""
        quant_t, quant_b, diff, _, _ = self.encode(x, train=train)
        return (self.decode(quant_t, quant_b), diff,
                self.decode_ir(quant_t, quant_b))

    def encode(self, x: jax.Array, train: bool = False):
        """Reference ``encode`` (``vqvae.py:223-240``): returns
        ``(quant_t, quant_b, diff, id_t, id_b)`` — all NHWC, no permutes."""
        h, w = x.shape[1:3]
        if h % 8 or w % 8:
            # same constraint as the torch reference: the stride-2 transposed
            # conv must exactly invert enc_t's stride-2, so H/4 and W/4 must
            # be even (otherwise the dec_t/enc_b concat shapes diverge)
            raise ValueError(
                f"VQVAE needs image H and W divisible by 8, got {(h, w)}; "
                f"pad or resize the input")
        enc_b = self.enc_b(x)
        enc_t = self.enc_t(enc_b)

        qt_in = self.quantize_conv_t(enc_t)
        quant_t, diff_t, id_t = self.quantize_t(qt_in, train=train)

        dec_t = self.dec_t(quant_t)
        enc_b = jnp.concatenate([dec_t, enc_b], axis=-1)

        qb_in = self.quantize_conv_b(enc_b)
        quant_b, diff_b, id_b = self.quantize_b(qb_in, train=train)

        return quant_t, quant_b, diff_t + diff_b, id_t, id_b

    def encode_ids(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Code-extraction fast path: ``(id_t, id_b)`` only.

        Identical argmins to :meth:`encode` (the top branch still quantizes
        fully — ``dec_t`` consumes ``quant_t``), but the bottom grid, which
        has 4× the rows, runs the indices-only kernel: a Pallas custom call's
        outputs cannot be dead-code-eliminated, so the full :meth:`encode`
        always pays the bottom lookup matmul even when only ids are used
        (reference ``extract_code.py:14-33`` stores only ids)."""
        h, w = x.shape[1:3]
        if h % 8 or w % 8:
            raise ValueError(
                f"VQVAE needs image H and W divisible by 8, got {(h, w)}; "
                f"pad or resize the input")
        enc_b = self.enc_b(x)
        enc_t = self.enc_t(enc_b)
        qt_in = self.quantize_conv_t(enc_t)
        quant_t, _, id_t = self.quantize_t(qt_in, train=False)
        dec_t = self.dec_t(quant_t)
        enc_b = jnp.concatenate([dec_t, enc_b], axis=-1)
        qb_in = self.quantize_conv_b(enc_b)
        id_b = self.quantize_b.codes(qb_in)
        return id_t, id_b

    def decode(self, quant_t: jax.Array, quant_b: jax.Array) -> jax.Array:
        """Reference ``decode`` (``vqvae.py:242-249``)."""
        upsample_t = self.upsample_t(quant_t)
        quant = jnp.concatenate([upsample_t, quant_b], axis=-1)
        return self.dec(quant)

    def decode_ir(self, quant_t: jax.Array, quant_b: jax.Array) -> jax.Array:
        """The fork's 1-channel IR head (reference ``vqvae.py:203-210``)."""
        upsample_t = self.upsample_t(quant_t)
        quant = jnp.concatenate([upsample_t, quant_b], axis=-1)
        return self.dec_ir(quant)

    def decode_code(self, code_t: jax.Array, code_b: jax.Array) -> jax.Array:
        """Reconstruct from integer codes (reference ``decode_code``,
        ``vqvae.py:251-259`` — with the latent-API bug there fixed: the
        reference calls ``decode(quant_t, quant_b)`` though its ``decode``
        takes one tensor; ours genuinely takes both)."""
        quant_t = self.quantize_t.embed_code(code_t).astype(self.dtype)
        quant_b = self.quantize_b.embed_code(code_b).astype(self.dtype)
        return self.decode(quant_t, quant_b)
