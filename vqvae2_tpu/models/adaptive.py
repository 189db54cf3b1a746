"""Adaptation composition models — TPU rebuilds of reference ``model.py``'s
``ModelAdaptive`` (``:283-342``), ``ModelAdaptive_Deep`` (``:415-490``) and
``ModelAdaptiveBi_Deep`` (``:492-579``): a ReID net (person/style branch) +
VQ-VAE adaptor(s) + Non-local content←style fusion + feature discriminator.

Method surface mirrors the reference so the trainers read the same:
``encode_person``, ``encode_content``, ``quantize_content``, ``fuse``,
``decode``, ``encode_and_decode``.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vqvae2_tpu.models.embed_net import EmbedNet
from vqvae2_tpu.models.layers import (
    Discriminator,
    NonLocal,
    ResidualBlock,
    SNConv,
    SNConvTranspose,
)
from vqvae2_tpu.models.vqvae import VQVAE, Encoder
from vqvae2_tpu.models.vqvae_deep import VQVAE_Deep

Dtype = Any


class ModelAdaptive(nn.Module):
    """Classic adaptor (reference ``ModelAdaptive``, model.py:283-342):
    embed_net + VQVAE + style encoder (two stride-2 Encoders) + spectral-norm
    1×1 convs around a Non-local fusion with two SN residual blocks."""

    class_num: int = 395
    arch: str = "resnet18"
    style_dim: int = 128
    dtype: Dtype = jnp.float32

    def setup(self):
        self.person_id = EmbedNet(self.class_num, arch=self.arch)
        self.fusion = NonLocal(reduc_ratio=1, dtype=self.dtype)
        self.adaptor = VQVAE(with_ir_head=True, dtype=self.dtype)
        self.encoder_s = [
            Encoder(self.style_dim, 3, 32, stride=2, dtype=self.dtype),
            Encoder(self.style_dim, 3, 32, stride=2, dtype=self.dtype),
        ]
        self.conv1 = SNConv(self.style_dim, (1, 1), dtype=self.dtype)
        self.conv2 = SNConv(self.style_dim, (1, 1), dtype=self.dtype)
        self.resblocks = [
            ResidualBlock(self.style_dim, dtype=self.dtype),
            ResidualBlock(self.style_dim, dtype=self.dtype),
        ]

    def encode_person(self, rgb: jax.Array, train: bool = False):
        """(feat, score, x4, actMap, x3) — reference model.py:313-315."""
        return self.person_id(xRGB=rgb, modal=1, with_feature=True, train=train)

    def encode_style(self, rgb: jax.Array) -> jax.Array:
        h = self.encoder_s[0](rgb)
        return self.encoder_s[1](h)

    def encode_content(self, img: jax.Array, train: bool = False):
        """Combined latent (upsampled top ∥ bottom) + diff — model.py:321-325."""
        quant_t, quant_b, diff, _, _ = self.adaptor.encode(img, train=train)
        upsample_t = self.adaptor.upsample_t(quant_t)
        quant = jnp.concatenate([upsample_t, quant_b], axis=-1)
        return quant, diff

    def fuse(self, content: jax.Array, style: jax.Array,
             train: bool = False) -> jax.Array:
        """SNConv → NonLocal(content, style) → 2 SN resblocks + skip → SNConv
        (reference model.py:327-333)."""
        c = self.conv1(content, update_stats=train)
        f = self.fusion(c, style, train=train)
        h = f
        for blk in self.resblocks:
            h = blk(h, update_stats=train)
        return self.conv2(h + f, update_stats=train)

    def decode(self, content: jax.Array) -> jax.Array:
        return self.adaptor.dec(content)

    def __call__(self, img: jax.Array, train: bool = False):
        """Plain VQVAE pass (what ``adaptor(img1)`` does in train_vqvae.py:72)."""
        return self.adaptor(img, train=train)


class ModelAdaptive_Deep(nn.Module):
    """Deep adaptor (reference ``ModelAdaptive_Deep``, model.py:415-490):
    two Non-local fusions against x3/x4 ReID features, VQVAE_Deep adaptor,
    feature Discriminator with 2·class_num outputs."""

    class_num: int = 395
    arch: str = "resnet18"
    style_dim: int = 256
    dtype: Dtype = jnp.float32

    def setup(self):
        self.person_id = EmbedNet(self.class_num, arch=self.arch,
                                  gm_pool="off")
        self.fusion1 = NonLocal(reduc_ratio=1, dtype=self.dtype)
        self.fusion2 = NonLocal(reduc_ratio=1, dtype=self.dtype)
        self.adaptor = VQVAE_Deep(dtype=self.dtype)
        self.conv1 = SNConv(self.style_dim, (1, 1), strides=(2, 2),
                            dtype=self.dtype)
        self.conv2 = SNConvTranspose(self.style_dim, dtype=self.dtype)
        self.resblocks1 = [ResidualBlock(self.style_dim, dtype=self.dtype)
                           for _ in range(2)]
        self.resblocks2 = [ResidualBlock(self.style_dim, dtype=self.dtype)
                           for _ in range(2)]
        self.discriminator = Discriminator(self.class_num * 2)

    def encode_person(self, rgb: jax.Array, train: bool = False):
        return self.person_id(xRGB=rgb, modal=1, with_feature=True, train=train)

    def encode_content(self, img: jax.Array) -> Tuple[jax.Array, jax.Array]:
        return self.adaptor.encode(img)

    def quantize_content(self, enc_b: jax.Array, enc_t: jax.Array,
                         train: bool = False):
        quant_t, quant_b, diff, _, _ = self.adaptor.quantize(enc_b, enc_t,
                                                             train=train)
        upsample_t = self.adaptor.upsample_t(quant_t)
        quant = jnp.concatenate([upsample_t, quant_b], axis=-1)
        return quant, diff

    def fuse(self, cb: jax.Array, ct: jax.Array, sb: jax.Array, st: jax.Array,
             train: bool = False):
        """Inject detached x3/x4 person features into bottom/top contents
        (reference model.py:469-474)."""
        sb = jax.lax.stop_gradient(sb)
        st = jax.lax.stop_gradient(st)
        f = self.fusion1(cb, sb, train=train)
        h = f
        for blk in self.resblocks1:
            h = blk(h, update_stats=train)
        cb = h + f
        f = self.fusion2(ct, st, train=train)
        h = f
        for blk in self.resblocks2:
            h = blk(h, update_stats=train)
        ct = h + f
        return cb, ct

    def decode(self, content: jax.Array,
               style: Optional[jax.Array] = None) -> jax.Array:
        return self.adaptor.decode(content, style)

    def encode_and_decode(self, img: jax.Array,
                          style: Optional[jax.Array] = None,
                          train: bool = False) -> jax.Array:
        """Reference ``encAndDec`` (model.py:476-481) without the 1→3 channel
        expand (our decoder emits out_channel directly)."""
        enc_b, enc_t = self.encode_content(img)
        content, _ = self.quantize_content(enc_b, enc_t, train=train)
        return self.decode(content, style)

    def discriminate(self, feat: jax.Array) -> jax.Array:
        return self.discriminator(feat)

    def __call__(self, img: jax.Array, style: Optional[jax.Array] = None,
                 train: bool = False):
        return self.adaptor(img, style, train=train)

    def init_probe(self, img: jax.Array):
        """Touch every submodule once so ``init`` creates all parameters
        (person branch, fusions, adaptor, discriminator)."""
        feat, score, feat2d, act_map, x3 = self.encode_person(img)
        enc_b, enc_t = self.encode_content(img)
        cb, ct = self.fuse(enc_b, enc_t, x3, feat2d)
        content, diff = self.quantize_content(cb, ct)
        dec = self.decode(content, feat)
        d = self.discriminate(feat)
        return dec


class ModelAdaptiveBi_Deep(nn.Module):
    """Bidirectional variant (reference ``ModelAdaptiveBi_Deep``,
    model.py:492-579): two independent adaptors (gray→IR and IR→gray) sharing
    the fusion/discriminator plumbing."""

    class_num: int = 395
    arch: str = "resnet18"
    style_dim: int = 256
    dtype: Dtype = jnp.float32

    def setup(self):
        self.person_id = EmbedNet(self.class_num, arch=self.arch,
                                  gm_pool="off")
        self.fusion1 = NonLocal(reduc_ratio=1, dtype=self.dtype)
        self.fusion2 = NonLocal(reduc_ratio=1, dtype=self.dtype)
        self.adaptor1 = VQVAE_Deep(dtype=self.dtype)
        self.adaptor2 = VQVAE_Deep(dtype=self.dtype)
        self.discriminator = Discriminator(self.class_num * 2)

    def _adaptor(self, which: int) -> VQVAE_Deep:
        return self.adaptor1 if which == 1 else self.adaptor2

    def encode_person(self, rgb: jax.Array, train: bool = False):
        return self.person_id(xRGB=rgb, modal=1, with_feature=True, train=train)

    def encode_content_1(self, img):
        return self.adaptor1.encode(img)

    def encode_content_2(self, img):
        return self.adaptor2.encode(img)

    def _quantize_content(self, enc_b, enc_t, adaptor: VQVAE_Deep,
                          train: bool = False):
        quant_t, quant_b, diff, _, _ = adaptor.quantize(enc_b, enc_t,
                                                        train=train)
        up = adaptor.upsample_t(quant_t)
        return jnp.concatenate([up, quant_b], axis=-1), diff

    def quantize_content_1(self, enc_b, enc_t, train: bool = False):
        return self._quantize_content(enc_b, enc_t, self.adaptor1, train=train)

    def quantize_content_2(self, enc_b, enc_t, train: bool = False):
        return self._quantize_content(enc_b, enc_t, self.adaptor2, train=train)

    def decode_1(self, content, style=None):
        return self.adaptor1.decode(content, style)

    def decode_2(self, content, style=None):
        return self.adaptor2.decode(content, style)

    def discriminate(self, feat: jax.Array) -> jax.Array:
        return self.discriminator(feat)

    def __call__(self, img: jax.Array, style: Optional[jax.Array] = None,
                 train: bool = False):
        # touches both adaptors + person branch so init covers everything
        d1 = self.adaptor1(img, style, train=train)
        d2 = self.adaptor2(img, style, train=train)
        return d1, d2
