"""Deep VQ-VAE with AdaIN style injection — TPU rebuild of reference
``vqvae_deep.py`` (the fork's deep variant of the Sonnet-derived VQ-VAE).

Differences from :mod:`vqvae2_tpu.models.vqvae` mirrored from the reference:

* Encoder supports strides 2/4/6/8 (``vqvae_deep.py:136-174``): stride-6 =
  2×+4× down (the SYSU person-crop geometry), stride-8 = 4×+4×.
* Decoder gains a style path (``vqvae_deep.py:177-229``): when ``style_dim>0``
  the residual blocks are :class:`AdainResBlk` driven by a style vector ``s``
  (AdaIN = InstanceNorm + FC → (γ, β), ``vqvae_deep.py:99-109``).
* ``VQVAE_Deep.forward`` returns ``(dec, diff, quant)`` and exposes split
  ``encode`` / ``quantize`` stages (``vqvae_deep.py:274-301``) — the
  adaptation trainers fuse person features into the latents between the two.

All NHWC; quantizer shared with the classic model (fused Pallas kernel).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vqvae2_tpu.models.vqvae import Quantize, ResBlock

Dtype = Any


class AdaIN(nn.Module):
    """Adaptive instance norm (reference ``AdaIN``, ``vqvae_deep.py:99-109``):
    ``(1 + γ(s)) · IN(x) + β(s)`` with a linear style projector."""

    num_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, s: jax.Array) -> jax.Array:
        h = nn.Dense(self.num_features * 2, dtype=self.dtype, name="fc")(s)
        gamma, beta = jnp.split(h[:, None, None, :], 2, axis=-1)
        # InstanceNorm without affine (per-sample, per-channel over H, W)
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        xn = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        return (1 + gamma) * xn + beta


class AdainResBlk(nn.Module):
    """AdaIN residual block (reference ``AdainResBlk``, ``vqvae_deep.py:112-134``):
    AdaIN → ReLU → 3×3 → AdaIN → ReLU → 1×1 + skip."""

    channel: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, s: jax.Array) -> jax.Array:
        in_channel = x.shape[-1]
        h = AdaIN(in_channel, dtype=self.dtype, name="norm1")(x, s)
        h = nn.Conv(self.channel, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv1")(nn.relu(h))
        h = AdaIN(self.channel, dtype=self.dtype, name="norm2")(h, s)
        h = nn.Conv(in_channel, (1, 1), dtype=self.dtype, name="conv2")(nn.relu(h))
        return x + h


class EncoderDeep(nn.Module):
    """Multi-stride encoder (reference ``Encoder``, ``vqvae_deep.py:136-174``)."""

    channel: int
    n_res_block: int
    n_res_channel: int
    stride: int  # 2 | 4 | 6 | 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c, dt = self.channel, self.dtype

        def down4(x):
            x = nn.Conv(c // 2, (4, 4), strides=(2, 2), padding="SAME", dtype=dt)(x)
            x = nn.relu(x)
            x = nn.Conv(c, (4, 4), strides=(2, 2), padding="SAME", dtype=dt)(x)
            x = nn.relu(x)
            return nn.Conv(c, (3, 3), padding="SAME", dtype=dt)(x)

        def down2(x):
            x = nn.Conv(c // 2, (4, 4), strides=(2, 2), padding="SAME", dtype=dt)(x)
            x = nn.relu(x)
            return nn.Conv(c, (3, 3), padding="SAME", dtype=dt)(x)

        if self.stride == 8:
            x = down4(down4(x))
        elif self.stride == 6:
            x = down4(down2(x))  # 2× then 4× (reference vqvae_deep.py:158-160)
        elif self.stride == 4:
            x = down4(x)
        elif self.stride == 2:
            x = down2(x)
        else:
            raise ValueError(f"unsupported stride {self.stride}")

        for _ in range(self.n_res_block):
            x = ResBlock(self.n_res_channel, c, dtype=dt)(x)
        return nn.relu(x)


class DecoderDeep(nn.Module):
    """Multi-stride decoder with optional AdaIN style path (reference
    ``Decoder``, ``vqvae_deep.py:177-229``)."""

    out_channel: int
    channel: int
    style_dim: int  # <=0: plain ResBlocks; >0: AdainResBlk driven by s
    n_res_block: int
    n_res_channel: int
    stride: int  # 2 | 4 | 6 | 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, s: Optional[jax.Array] = None) -> jax.Array:
        c, dt = self.channel, self.dtype
        x = nn.Conv(c, (3, 3), padding="SAME", dtype=dt, name="conv1")(x)
        if self.style_dim > 0:
            assert s is not None, "style decoder requires a style vector"
            for i in range(self.n_res_block):
                x = AdainResBlk(self.n_res_channel, dtype=dt, name=f"adain{i}")(x, s)
        else:
            for i in range(self.n_res_block):
                x = ResBlock(self.n_res_channel, c, dtype=dt)(x)
        x = nn.relu(x)

        def up4(x, out_ch):
            x = nn.ConvTranspose(c // 2, (4, 4), strides=(2, 2), padding="SAME",
                                 dtype=dt)(x)
            x = nn.relu(x)
            return nn.ConvTranspose(out_ch, (4, 4), strides=(2, 2), padding="SAME",
                                    dtype=dt)(x)

        def up2(x, out_ch):
            return nn.ConvTranspose(out_ch, (4, 4), strides=(2, 2), padding="SAME",
                                    dtype=dt)(x)

        if self.stride == 8:
            x = up4(up4(x, self.out_channel), self.out_channel)
        elif self.stride == 6:
            x = up2(up4(x, self.out_channel), self.out_channel)
        elif self.stride == 4:
            x = up4(x, self.out_channel)
        elif self.stride == 2:
            x = up2(x, self.out_channel)
        else:
            raise ValueError(f"unsupported stride {self.stride}")
        return x


class VQVAE_Deep(nn.Module):
    """Deep 2-level VQ-VAE (reference ``VQVAE_Deep``, ``vqvae_deep.py:234-320``).

    Defaults per ``vqvae_deep.py:236-245``: channel=256, n_res_block=6,
    n_res_channel=128, embed_dim=256, n_embed=512, style_dim=2048.  Bottom
    "stride 6" = 2×+4× stages (8× spatial); top stride 2 on top of that
    (16× total).  The combined latent (``upsample_t ∥ quant_b``) has
    ``2·embed_dim`` channels.
    """

    in_channel: int = 3
    channel: int = 256
    n_res_block: int = 6
    n_res_channel: int = 128
    embed_dim: int = 256
    n_embed: int = 512
    decay: float = 0.99
    out_channel: int = 3
    style_dim: int = 2048
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    def setup(self):
        dt = self.dtype
        self.enc_b = EncoderDeep(self.channel, self.n_res_block,
                                 self.n_res_channel, stride=6, dtype=dt)
        self.enc_t = EncoderDeep(self.channel, self.n_res_block,
                                 self.n_res_channel, stride=2, dtype=dt)
        self.quantize_conv_t = nn.Conv(self.embed_dim, (1, 1), dtype=dt)
        self.quantize_t = Quantize(self.embed_dim, self.n_embed, self.decay,
                                   axis_name=self.axis_name)
        self.dec_t = DecoderDeep(self.embed_dim, self.channel, -1,
                                 self.n_res_block, self.n_res_channel,
                                 stride=2, dtype=dt)
        self.quantize_conv_b = nn.Conv(self.embed_dim, (1, 1), dtype=dt)
        self.quantize_b = Quantize(self.embed_dim, self.n_embed, self.decay,
                                   axis_name=self.axis_name)
        self.upsample_t = nn.ConvTranspose(self.embed_dim, (4, 4), strides=(2, 2),
                                           padding="SAME", dtype=dt)
        self.dec = DecoderDeep(self.out_channel, self.channel, self.style_dim,
                               self.n_res_block, self.n_res_channel,
                               stride=6, dtype=dt)

    @property
    def latent_dim(self) -> int:
        return 2 * self.embed_dim  # reference self.embed_dim = 2*embed_dim

    def __call__(self, x: jax.Array, style: Optional[jax.Array] = None,
                 train: bool = False):
        """Reference forward (``vqvae_deep.py:274-280``):
        returns ``(dec, diff, quant)``."""
        enc_b, enc_t = self.encode(x)
        quant_t, quant_b, diff, _, _ = self.quantize(enc_b, enc_t, train=train)
        upsample_t = self.upsample_t(quant_t)
        quant = jnp.concatenate([upsample_t, quant_b], axis=-1)
        dec = self.decode(quant, style)
        return dec, diff, quant

    def encode(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Split stage 1 (reference ``vqvae_deep.py:282-285``)."""
        enc_b = self.enc_b(x)
        enc_t = self.enc_t(enc_b)
        return enc_b, enc_t

    def quantize(self, enc_b: jax.Array, enc_t: jax.Array, train: bool = False):
        """Split stage 2 (reference ``vqvae_deep.py:287-301``)."""
        qt_in = self.quantize_conv_t(enc_t)
        quant_t, diff_t, id_t = self.quantize_t(qt_in, train=train)

        dec_t = self.dec_t(quant_t)
        enc_b = jnp.concatenate([dec_t, enc_b], axis=-1)

        qb_in = self.quantize_conv_b(enc_b)
        quant_b, diff_b, id_b = self.quantize_b(qb_in, train=train)
        return quant_t, quant_b, diff_t + diff_b, id_t, id_b

    def upsample_top(self, quant_t: jax.Array) -> jax.Array:
        return self.upsample_t(quant_t)

    def decode(self, quant: jax.Array, style: Optional[jax.Array] = None) -> jax.Array:
        """Reference ``decode(quant, style)`` (``vqvae_deep.py:309-310``)."""
        return self.dec(quant, style)

    def decode_code(self, code_t: jax.Array, code_b: jax.Array,
                    style: Optional[jax.Array] = None) -> jax.Array:
        """Reconstruct from integer codes (reference ``vqvae_deep.py:312-320``,
        with its decode-arity bug fixed: the combined latent is assembled
        before the style decoder)."""
        quant_t = self.quantize_t.embed_code(code_t).astype(self.dtype)
        quant_b = self.quantize_b.embed_code(code_b).astype(self.dtype)
        quant = jnp.concatenate([self.upsample_t(quant_t), quant_b], axis=-1)
        return self.decode(quant, style)
