"""SSD300-style detector — TPU rebuild of reference ``ssd/model.py``
(``SSD300``, ``:55-130``: ResNet backbone, extra feature pyramid, per-level
loc/conf heads over the 8732 default boxes) exercised through the ModaNet
fashion workload (``fashionSSD.py``).
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vqvae2_tpu.models.resnet import ResNetStem, ResNetTrunk

Dtype = Any

# boxes per feature level (SSD300: 4, 6, 6, 6, 4, 4)
DEFAULT_NUM_BOXES = (4, 6, 6, 6, 4, 4)
DEFAULT_CHANNELS = (256, 512, 512, 256, 256, 256)


class ExtraBlock(nn.Module):
    """Down-sampling extra feature block (reference ``_build_additional_features``,
    ssd/model.py:80-106)."""

    mid: int
    out: int
    stride: int = 2
    pad_valid: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = nn.Conv(self.mid, (1, 1), use_bias=False, dtype=self.dtype)(x)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        pad = "VALID" if self.pad_valid else "SAME"
        h = nn.Conv(self.out, (3, 3), strides=(self.stride, self.stride),
                    padding=pad, use_bias=False, dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        return nn.relu(h)


class SSD300(nn.Module):
    """SSD over a ResNet backbone (reference ssd/model.py:55-130).

    Input: (B, 300, 300, 3) NHWC. Output: (loc (B, 8732, 4),
    conf (B, 8732, num_classes)).
    """

    num_classes: int = 81
    arch: str = "resnet18"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        # backbone to layer3 at stride 8 (reference keeps a 38x38 map by
        # cutting the resnet and re-striding; we take layer2 output at 38x38)
        h = ResNetStem(self.arch, dtype=self.dtype, name="stem")(x, train=train)
        h = nn.relu(h)
        # layer2 (stride 2): 75 -> 38
        from vqvae2_tpu.models.resnet import CONFIGS, _make_layer
        cfg = CONFIGS[self.arch]
        expansion = 1 if cfg["block"] == "basic" else 4
        for blk in _make_layer(cfg["block"], 128, cfg["layers"][1], 2,
                               64 * expansion, self.dtype, "layer2"):
            h = blk(h, train=train)
        feats = [h]  # 38x38
        for blk in _make_layer(cfg["block"], 256, cfg["layers"][2], 2,
                               128 * expansion, self.dtype, "layer3"):
            h = blk(h, train=train)
        feats.append(h)  # 19x19
        h = ExtraBlock(256, 512, dtype=self.dtype, name="extra0")(h, train=train)
        feats.append(h)  # 10x10
        h = ExtraBlock(256, 256, dtype=self.dtype, name="extra1")(h, train=train)
        feats.append(h)  # 5x5
        h = ExtraBlock(128, 256, stride=1, pad_valid=True, dtype=self.dtype,
                       name="extra2")(h, train=train)
        feats.append(h)  # 3x3
        h = ExtraBlock(128, 256, stride=1, pad_valid=True, dtype=self.dtype,
                       name="extra3")(h, train=train)
        feats.append(h)  # 1x1

        locs, confs = [], []
        for i, (f, nb) in enumerate(zip(feats, DEFAULT_NUM_BOXES)):
            loc = nn.Conv(nb * 4, (3, 3), padding="SAME", dtype=self.dtype,
                          name=f"loc{i}")(f)
            conf = nn.Conv(nb * self.num_classes, (3, 3), padding="SAME",
                           dtype=self.dtype, name=f"conf{i}")(f)
            b = f.shape[0]
            locs.append(loc.reshape(b, -1, 4))
            confs.append(conf.reshape(b, -1, self.num_classes))
        return jnp.concatenate(locs, axis=1), jnp.concatenate(confs, axis=1)
