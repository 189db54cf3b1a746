"""StarGAN v2 model family — TPU rebuild of reference ``starGAN/model.py``
(NAVER StarGAN-v2, vendored by the fork and driven by train_vqvae_deep_bi2).

All NHWC.  The generator's skip-feature cache (reference ``Generator.forward``,
starGAN/model.py:175-188) is keyed by static spatial size at trace time —
shapes are compile-time constants under jit, so the cache is just Python dict
logic during tracing.
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vqvae2_tpu.models.vqvae_deep import AdaIN

Dtype = Any


def _instance_norm(x, scale=None, bias=None, eps=1e-5):
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        y = y * scale + bias
    return y


class ResBlk(nn.Module):
    """Pre-act residual block with √2 scaling (reference starGAN/model.py:24-65)."""

    dim_out: int
    normalize: bool = False
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dim_in = x.shape[-1]
        sc = x
        if dim_in != self.dim_out:
            sc = nn.Conv(self.dim_out, (1, 1), use_bias=False,
                         dtype=self.dtype, name="conv1x1")(sc)
        if self.downsample:
            sc = nn.avg_pool(sc, (2, 2), strides=(2, 2))

        h = x
        if self.normalize:
            s1 = self.param("in1_scale", nn.initializers.ones, (dim_in,))
            b1 = self.param("in1_bias", nn.initializers.zeros, (dim_in,))
            h = _instance_norm(h, s1, b1)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(dim_in, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv1")(h)
        if self.downsample:
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
        if self.normalize:
            s2 = self.param("in2_scale", nn.initializers.ones, (dim_in,))
            b2 = self.param("in2_bias", nn.initializers.zeros, (dim_in,))
            h = _instance_norm(h, s2, b2)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.dim_out, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv2")(h)
        return (sc + h) / math.sqrt(2)


class AdainResBlkV2(nn.Module):
    """Style-conditioned residual block (reference starGAN/model.py:81-121)."""

    dim_out: int
    w_hpf: int = 0
    upsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, s: jax.Array) -> jax.Array:
        dim_in = x.shape[-1]

        def up(t):
            b, h, w, c = t.shape
            return jax.image.resize(t, (b, h * 2, w * 2, c), method="nearest")

        sc = x
        if self.upsample:
            sc = up(sc)
        if dim_in != self.dim_out:
            sc = nn.Conv(self.dim_out, (1, 1), use_bias=False,
                         dtype=self.dtype, name="conv1x1")(sc)

        h = AdaIN(dim_in, dtype=self.dtype, name="norm1")(x, s)
        h = nn.leaky_relu(h, 0.2)
        if self.upsample:
            h = up(h)
        h = nn.Conv(self.dim_out, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv1")(h)
        h = AdaIN(self.dim_out, dtype=self.dtype, name="norm2")(h, s)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.dim_out, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv2")(h)
        if self.w_hpf == 0:
            return (h + sc) / math.sqrt(2)
        return h


def high_pass(x: jax.Array, w_hpf: float) -> jax.Array:
    """3×3 Laplacian high-pass, depthwise (reference HighPass,
    starGAN/model.py:124-134)."""
    c = x.shape[-1]
    k = (np.asarray([[-1, -1, -1], [-1, 8.0, -1], [-1, -1, -1]], np.float32)
         / w_hpf)
    kernel = jnp.asarray(np.tile(k[:, :, None, None], (1, 1, 1, c)))
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)


class Generator(nn.Module):
    """Hourglass generator with skip cache + high-pass injection (reference
    starGAN/model.py:137-188).  NOTE: ``to_rgb`` emits 1 channel like the
    reference (the fork's IR-translation head)."""

    img_size: int = 128
    style_dim: int = 64
    max_conv_dim: int = 512
    w_hpf: int = 1
    out_channel: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, s: jax.Array,
                 masks: Optional[Tuple[jax.Array, jax.Array]] = None) -> jax.Array:
        dim_in = 2 ** 14 // self.img_size
        repeat_num = int(np.log2(self.img_size)) - 4
        if self.w_hpf > 0:
            repeat_num += 1

        div = 1 << repeat_num
        if x.shape[1] % div or x.shape[2] % div:
            # Stride-2 SAME floors the odd side going down and ×2 upsampling
            # cannot recover it, so the output silently comes back the wrong
            # size (e.g. 144 → 128 over 5 stages). Fail at trace time instead.
            raise ValueError(
                f"Generator(img_size={self.img_size}) runs {repeat_num} "
                f"stride-2 stages; input {x.shape[1]}x{x.shape[2]} must be "
                f"divisible by {div} (use a smaller img_size)")

        dims = [dim_in]
        for _ in range(repeat_num):
            dims.append(min(dims[-1] * 2, self.max_conv_dim))

        h = nn.Conv(dim_in, (3, 3), padding="SAME", dtype=self.dtype,
                    name="from_rgb")(x)
        cache = {}
        for i in range(repeat_num):
            if masks is not None and h.shape[1] in (32, 64, 128):
                cache[h.shape[1]] = h
            h = ResBlk(dims[i + 1], normalize=True, downsample=True,
                       dtype=self.dtype, name=f"enc{i}")(h)
        for i in range(2):
            h = ResBlk(dims[-1], normalize=True, dtype=self.dtype,
                       name=f"enc_bottleneck{i}")(h)

        for i in range(2):
            h = AdainResBlkV2(dims[-1], w_hpf=self.w_hpf, dtype=self.dtype,
                              name=f"dec_bottleneck{i}")(h, s)
        for i in reversed(range(repeat_num)):
            h = AdainResBlkV2(dims[i], w_hpf=self.w_hpf, upsample=True,
                              dtype=self.dtype, name=f"dec{i}")(h, s)
            if masks is not None and h.shape[1] in (32, 64, 128):
                mask = masks[0] if h.shape[1] == 32 else masks[1]
                b, hh, ww, _ = h.shape
                mask = jax.image.resize(mask, (mask.shape[0], hh, ww,
                                               mask.shape[-1]), "bilinear")
                h = h + high_pass(mask * cache[hh], self.w_hpf)

        scale = self.param("to_rgb_in_scale", nn.initializers.ones, (dim_in,))
        bias = self.param("to_rgb_in_bias", nn.initializers.zeros, (dim_in,))
        h = _instance_norm(h, scale, bias)
        h = nn.leaky_relu(h, 0.2)
        return nn.Conv(self.out_channel, (1, 1), dtype=self.dtype,
                       name="to_rgb")(h)


class MappingNetwork(nn.Module):
    """Latent → per-domain style (reference starGAN/model.py:191-220)."""

    style_dim: int = 64
    num_domains: int = 2

    @nn.compact
    def __call__(self, z: jax.Array, y: jax.Array) -> jax.Array:
        h = nn.relu(nn.Dense(512, name="shared0")(z))
        for i in range(3):
            h = nn.relu(nn.Dense(512, name=f"shared{i+1}")(h))
        outs = []
        for d in range(self.num_domains):
            g = h
            for i in range(3):
                g = nn.relu(nn.Dense(512, name=f"dom{d}_{i}")(g))
            outs.append(nn.Dense(self.style_dim, name=f"dom{d}_out")(g))
        out = jnp.stack(outs, axis=1)  # (B, num_domains, style_dim)
        return jnp.take_along_axis(
            out, y.astype(jnp.int32)[:, None, None], axis=1)[:, 0]


class StyleEncoder(nn.Module):
    """Image → per-domain style (reference starGAN/model.py:223-255)."""

    img_size: int = 128
    style_dim: int = 64
    num_domains: int = 2
    max_conv_dim: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        dim_in = 2 ** 14 // self.img_size
        h = nn.Conv(dim_in, (3, 3), padding="SAME", dtype=self.dtype)(x)
        repeat_num = int(np.log2(self.img_size)) - 2
        for i in range(repeat_num):
            dim_in = min(dim_in * 2, self.max_conv_dim)
            h = ResBlk(dim_in, downsample=True, dtype=self.dtype,
                       name=f"blk{i}")(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(dim_in, (4, 4), padding="VALID", dtype=self.dtype)(h)
        h = nn.leaky_relu(h, 0.2)
        h = jnp.mean(h, axis=(1, 2))
        outs = [nn.Dense(self.style_dim, name=f"dom{d}")(h)
                for d in range(self.num_domains)]
        out = jnp.stack(outs, axis=1)
        return jnp.take_along_axis(
            out, y.astype(jnp.int32)[:, None, None], axis=1)[:, 0]


class DiscriminatorV2(nn.Module):
    """Multi-domain image discriminator (reference starGAN/model.py:258-283)."""

    img_size: int = 128
    num_domains: int = 2
    max_conv_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        dim_in = 2 ** 14 // self.img_size
        h = nn.Conv(dim_in, (3, 3), padding="SAME", dtype=self.dtype)(x)
        repeat_num = int(np.log2(self.img_size)) - 2
        for i in range(repeat_num):
            dim_in = min(dim_in * 2, self.max_conv_dim)
            h = ResBlk(dim_in, downsample=True, dtype=self.dtype,
                       name=f"blk{i}")(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(dim_in, (4, 4), padding="VALID", dtype=self.dtype)(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.num_domains, (1, 1), dtype=self.dtype)(h)
        h = jnp.mean(h, axis=(1, 2))  # (B, num_domains)
        return jnp.take_along_axis(h, y.astype(jnp.int32)[:, None], axis=1)[:, 0]


class ModelStarGAN(nn.Module):
    """Two-domain generator pair driven by person features through a mapping
    network (reference ``ModelStarGAN``, starGAN/model.py:311-348)."""

    class_num: int
    feat_d: int = 2048
    arch: str = "resnet18"
    img_size: int = 128
    remat: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        from vqvae2_tpu.models.embed_net import EmbedNet

        # The hourglass runs 2**14/img_size channels at FULL input resolution
        # (2.7 GB per from_rgb tensor at SYSU 288x144, b16, img_size=128) and
        # the generator objective differentiates through FOUR such passes
        # (g2i, i2g and both cycles) — saving those activations for the
        # backward exceeds one v5e's 16 GB HBM.  Rematerialize: only each
        # pass's (small, full-res 3-channel) inputs/outputs are saved and the
        # interiors are recomputed in the backward — the classic TPU
        # FLOPs-for-HBM trade (conv recompute is cheap next to the saved
        # round-trips).
        Gen = nn.remat(Generator) if self.remat else Generator
        Disc = nn.remat(DiscriminatorV2) if self.remat else DiscriminatorV2
        self.person_id = EmbedNet(self.class_num, arch=self.arch)
        self.mapping = MappingNetwork(512, 2)
        self.adaptor1 = Gen(self.img_size, 512, dtype=self.dtype)
        self.adaptor2 = Gen(self.img_size, 512, dtype=self.dtype)
        self.discriminator = Disc(self.img_size, 2, dtype=self.dtype)

    def encode_person(self, rgb: jax.Array, train: bool = False):
        return self.person_id(xRGB=rgb, modal=1, with_feature=True, train=train)

    def gen_1(self, img: jax.Array, s: jax.Array) -> jax.Array:
        y = jnp.zeros((s.shape[0],), jnp.int32)
        return self.adaptor1(img, self.mapping(s, y))

    def gen_2(self, img: jax.Array, s: jax.Array) -> jax.Array:
        y = jnp.ones((s.shape[0],), jnp.int32)
        return self.adaptor2(img, self.mapping(s, y))

    def discriminate(self, img: jax.Array, y: jax.Array) -> jax.Array:
        return self.discriminator(img, y)

    def __call__(self, img: jax.Array, s: jax.Array):
        return self.gen_1(img, s), self.gen_2(img, s)
