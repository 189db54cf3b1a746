"""ABN module layer — flax equivalents of reference ``part/modules/bn.py``:
``ABN`` (plain batch-norm + activation, bn.py:13-81), ``InPlaceABN``
(fused custom-vjp op, bn.py:84-110) and ``InPlaceABNSync`` (cross-device
moment sync, bn.py:113-121).

Running stats live in the ``"batch_stats"`` collection with torch semantics:
``running = (1−m)·running + m·batch`` and the unbiased-var correction
``count/(count−1)`` (reference functions.py:98-100,186-189).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from vqvae2_tpu.ops.inplace_abn import (
    ACT_ELU,
    ACT_LEAKY_RELU,
    ACT_NONE,
    batch_moments,
    inplace_abn,
)


class InPlaceABN(nn.Module):
    """Fused activated batch norm (reference ``InPlaceABN``, bn.py:84-110)."""

    num_features: int
    eps: float = 1e-5
    momentum: float = 0.1
    affine: bool = True
    activation: str = ACT_LEAKY_RELU
    slope: float = 0.01
    axis_name: Optional[str] = None  # set → InPlaceABNSync semantics

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c = self.num_features
        assert x.shape[-1] == c, f"expected {c} channels, got {x.shape}"
        weight = self.param("weight", nn.initializers.ones, (c,)) if self.affine else None
        bias = self.param("bias", nn.initializers.zeros, (c,)) if self.affine else None
        running_mean = self.variable("batch_stats", "running_mean",
                                     lambda: jnp.zeros((c,), jnp.float32))
        running_var = self.variable("batch_stats", "running_var",
                                    lambda: jnp.ones((c,), jnp.float32))

        if train and not self.is_initializing():
            mean, var = batch_moments(x, axis_name=self.axis_name)
            count = x.size // c
            if self.axis_name is not None:
                count = count * jax.lax.psum(1, self.axis_name)
            running_mean.value = ((1 - self.momentum) * running_mean.value
                                  + self.momentum * mean)
            running_var.value = ((1 - self.momentum) * running_var.value
                                 + self.momentum * var * (count / (count - 1)))
        else:
            mean, var = running_mean.value, running_var.value

        return inplace_abn(x, weight, bias, mean, var, self.eps,
                           self.activation, self.slope, self.axis_name,
                           train)


def InPlaceABNSync(num_features: int, axis_name: str = "data", **kw) -> InPlaceABN:
    """Cross-device-synced ABN (reference ``InPlaceABNSync``, bn.py:113-121).
    Under shard_map the moments/grad-sums psum over ``axis_name``; under plain
    GSPMD jit the same collectives appear automatically from batch sharding."""
    return InPlaceABN(num_features, axis_name=axis_name, **kw)


class ABN(nn.Module):
    """Plain (non-fused) batch-norm + activation (reference ``ABN``,
    bn.py:13-81) — the reference composes torch batch_norm + activation; here
    flax BatchNorm + activation.  Kept for parity and as the autodiff ground
    truth the fused op is tested against."""

    num_features: int
    eps: float = 1e-5
    momentum: float = 0.1
    affine: bool = True
    activation: str = ACT_LEAKY_RELU
    slope: float = 0.01
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.BatchNorm(
            use_running_average=not train, momentum=1 - self.momentum,
            epsilon=self.eps, use_bias=self.affine, use_scale=self.affine,
            axis_name=self.axis_name,
        )(x)
        if self.activation == ACT_LEAKY_RELU:
            return nn.leaky_relu(x, self.slope)
        if self.activation == ACT_ELU:
            return nn.elu(x)
        if self.activation == ACT_NONE:
            return x
        if self.activation == "relu":
            return nn.relu(x)
        raise ValueError(self.activation)
