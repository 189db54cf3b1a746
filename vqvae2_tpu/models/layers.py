"""Shared layers for the ReID / adaptation model zoo — TPU rebuilds of the
building blocks in reference ``model.py``.

Includes: feature-norm attention mask (``compute_mask``, model.py:15-23),
L2 ``Normalize`` (model.py:25-33), GeM pooling (``gl_pool``, model.py:193-204),
``MLP``/``LinearBlock`` (model.py:211-281), spectral-norm ``ResidualBlock``
with instance norm (model.py:345-357), cross-attention ``NonLocal`` fusion
(model.py:359-412), and the feature ``Discriminator`` (model.py:582-597).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def compute_mask(feat: jax.Array) -> jax.Array:
    """Attention mask from feature norms (reference ``compute_mask``,
    model.py:15-23): per-pixel L2 norm over channels, min-max normalized per
    sample, detached.  NHWC: feat (B, H, W, C) → mask (B, H, W, 1)."""
    b, h, w, c = feat.shape
    norms = jnp.linalg.norm(feat, axis=-1).reshape(b, h * w)
    norms = norms - jnp.min(norms, axis=-1, keepdims=True)
    norms = norms / (jnp.max(norms, axis=-1, keepdims=True) + 1e-12)
    return jax.lax.stop_gradient(norms.reshape(b, h, w, 1))


def l2_normalize(x: jax.Array, axis: int = -1, power: int = 2) -> jax.Array:
    """Reference ``Normalize`` (model.py:25-33)."""
    norm = jnp.power(jnp.sum(jnp.power(jnp.abs(x), power), axis=axis,
                             keepdims=True), 1.0 / power)
    return x / norm


def gem_pool(x: jax.Array, p: float = 3.0, eps: float = 1e-12) -> jax.Array:
    """Generalized-mean pooling (reference ``gl_pool`` with gm_pool='on',
    model.py:193-204): (mean(x^p) + eps)^(1/p) over spatial dims.
    NHWC (B, H, W, C) → (B, C)."""
    b, h, w, c = x.shape
    return jnp.power(jnp.mean(jnp.power(x, p), axis=(1, 2)) + eps, 1.0 / p)


def avg_pool(x: jax.Array) -> jax.Array:
    """gl_pool with gm_pool='off' — plain global average (model.py:200-203)."""
    return jnp.mean(x, axis=(1, 2))


class SNConv(nn.Module):
    """Spectral-norm conv (reference ``spectral_norm(nn.Conv2d(...))`` uses,
    e.g. model.py:297-299,350-354) via flax's power-iteration SpectralNorm."""

    features: int
    kernel_size: tuple = (1, 1)
    strides: tuple = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool = False) -> jax.Array:
        conv = nn.Conv(self.features, self.kernel_size, strides=self.strides,
                       padding=self.padding, use_bias=self.use_bias,
                       dtype=self.dtype)
        return nn.SpectralNorm(conv)(x, update_stats=update_stats)


class SNConvTranspose(nn.Module):
    features: int
    kernel_size: tuple = (4, 4)
    strides: tuple = (2, 2)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool = False) -> jax.Array:
        conv = nn.ConvTranspose(self.features, self.kernel_size,
                                strides=self.strides, padding="SAME",
                                dtype=self.dtype)
        return nn.SpectralNorm(conv)(x, update_stats=update_stats)


class InstanceNorm(nn.Module):
    """Per-sample, per-channel norm over spatial dims with optional affine
    (torch ``nn.InstanceNorm2d(affine=True)`` in model.py:351-354)."""

    affine: bool = True
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            c = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            y = y * scale + bias
        return y


class ResidualBlock(nn.Module):
    """Spectral-norm + instance-norm residual block (reference
    ``ResidualBlock``, model.py:345-357)."""

    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool = False) -> jax.Array:
        h = SNConv(self.dim_out, (3, 3), use_bias=False, dtype=self.dtype,
                   name="conv1")(x, update_stats=update_stats)
        h = InstanceNorm(name="in1")(h)
        h = nn.relu(h)
        h = SNConv(self.dim_out, (3, 3), use_bias=False, dtype=self.dtype,
                   name="conv2")(h, update_stats=update_stats)
        h = InstanceNorm(name="in2")(h)
        return x + h


class LinearBlock(nn.Module):
    """Dense + activation zoo (reference ``LinearBlock``, model.py:247-281)."""

    features: int
    activation: str = "relu"  # relu | lrelu | prelu | selu | tanh | none

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.features)(x)
        if self.activation == "relu":
            return nn.relu(x)
        if self.activation == "lrelu":
            return nn.leaky_relu(x, 0.2)
        if self.activation == "prelu":
            a = self.param("prelu_a", nn.initializers.constant(0.25), ())
            return jnp.where(x >= 0, x, a * x)
        if self.activation == "selu":
            return nn.selu(x)
        if self.activation == "tanh":
            return nn.tanh(x)
        if self.activation == "none":
            return x
        raise ValueError(f"unsupported activation {self.activation}")


class MLP(nn.Module):
    """Reference ``MLP`` (model.py:211-223): n_blk LinearBlocks, last one
    linear (no activation)."""

    output_dim: int
    dim: int = 512
    n_blk: int = 2
    activ: str = "relu"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x.reshape(x.shape[0], -1)
        x = LinearBlock(self.dim, self.activ)(x)
        for _ in range(self.n_blk - 2):
            x = LinearBlock(self.dim, self.activ)(x)
        return LinearBlock(self.output_dim, "none")(x)


class NonLocal(nn.Module):
    """Cross-attention content←style fusion (reference ``Non_local``,
    model.py:359-412): softmax(θ(c)ᵀφ(s)/N)·g(s) → 1×1 W with zero-init
    BN-scale + residual.  NHWC.

    ``inter_channels = content_channels // reduc_ratio``.
    """

    reduc_ratio: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, c: jax.Array, s: jax.Array, train: bool = False) -> jax.Array:
        b, hc, wc, cc = c.shape
        _, hs, ws, cs = s.shape
        inter = max(cc // self.reduc_ratio, 1)

        g_s = nn.Conv(inter, (1, 1), dtype=self.dtype, name="g")(s)
        g_s = g_s.reshape(b, hs * ws, inter)

        theta_c = nn.Conv(inter, (1, 1), dtype=self.dtype, name="theta")(c)
        theta_c = theta_c.reshape(b, hc * wc, inter)
        phi_s = nn.Conv(inter, (1, 1), dtype=self.dtype, name="phi")(s)
        phi_s = phi_s.reshape(b, hs * ws, inter)

        f = jnp.einsum("bqi,bki->bqk", theta_c, phi_s)
        n = f.shape[-1]
        attn = jax.nn.softmax(f / n, axis=-1)  # reference divides by N pre-softmax
        y = jnp.einsum("bqk,bki->bqi", attn, g_s).reshape(b, hc, wc, inter)

        # W: 1x1 conv + BatchNorm with zero-init scale (residual starts as id)
        w_y = nn.Conv(cc, (1, 1), dtype=self.dtype, name="W_conv")(y)
        w_y = nn.BatchNorm(
            use_running_average=not train,
            scale_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="W_bn",
        )(w_y)
        return w_y + c


class Discriminator(nn.Module):
    """Feature-space discriminator (reference ``Discriminator``,
    model.py:582-597): an MLP d_in → 512 → d_out over pooled features; the
    bi trainers use d_out = 2·class_num (real/fake modality per identity)."""

    d_out: int
    dim: int = 512

    @nn.compact
    def __call__(self, feat: jax.Array) -> jax.Array:
        return MLP(self.d_out, self.dim, n_blk=2, activ="relu")(feat)
