"""Dual-stream cross-modal ReID network — TPU rebuild of reference
``embed_net`` (``model.py:74-207``) and the Non-local variant ``embed_net2``
(``old_model.py:99-214``).

Architecture (citations into the reference):

* per-modality stems (thermal / visible / z), each conv1→bn1→maxpool→layer1
  with no stem relu (``model.py:117-123``), shared layer2-4 trunk with
  last-stride-1 surgery (``model.py:81-90``);
* modal routing 0=RGB+IR concat, 1=RGB, 2=IR, 3=Z (``model.py:143-154``);
* GeM pooling p=3 (``gl_pool``, ``model.py:193-204``);
* BN-neck ``bottleneck`` (BatchNorm1d, bias frozen at 0, ``model.py:126-128``)
  + bias-free linear classifier (``model.py:132``);
* attention mask from feature norms (``compute_mask``, ``model.py:15-23``);
* optional 6-part local head: adaptive-GeM to 6 vertical parts, per-part
  conv+bn+relu and classifiers (``model.py:105-113,164-179``);
* eval mode returns L2-normalized (feat, feat_pool) (``model.py:189-190``);
  ``with_feature`` returns (feat_pool, logits, x4, mask, x3) (``model.py:186-187``).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vqvae2_tpu.models.layers import compute_mask, gem_pool, avg_pool, l2_normalize
from vqvae2_tpu.models.resnet import ResNetStem, ResNetTrunk, pool_dim

Dtype = Any


class BNNeck(nn.Module):
    """BatchNorm1d bottleneck with frozen (zero) bias — the reference freezes
    the shift (``model.py:126-128``)."""

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return nn.BatchNorm(use_running_average=not train, use_bias=False,
                            name="bn")(x)


class PartHead(nn.Module):
    """6-part local head (reference ``model.py:105-113,164-179``): adaptive
    GeM-pool x4 to (6, 1) vertical parts (p=10), per-part 1×1 conv+BN+ReLU to
    512, per-part classifier."""

    class_num: int
    n_parts: int = 6
    p: float = 10.0

    @nn.compact
    def __call__(self, x4: jax.Array, train: bool = False):
        b, h, w, c = x4.shape
        # adaptive_avg_pool2d(x^p, (6,1))^(1/p): split H into 6 bins, avg over bin+W
        assert h % self.n_parts == 0, f"H={h} not divisible into {self.n_parts} parts"
        binned = x4.reshape(b, self.n_parts, h // self.n_parts, w, c)
        pooled = jnp.power(
            jnp.mean(jnp.power(binned, self.p) + 1e-12, axis=(2, 3)), 1.0 / self.p
        )  # (B, 6, C)
        feats, logits = [], []
        for i in range(self.n_parts):
            f = nn.Dense(512, name=f"local_conv{i}")(pooled[:, i])
            f = nn.BatchNorm(use_running_average=not train, name=f"local_bn{i}")(f)
            f = nn.relu(f)
            feats.append(f)
            logits.append(nn.Dense(self.class_num, name=f"fc{i}")(f))
        return feats, logits, jnp.concatenate(feats, axis=-1)


class EmbedNet(nn.Module):
    """Reference ``embed_net`` (``model.py:74-207``).

    ``no_local="on"`` swaps the plain trunk for the Non-local-interleaved
    trunk — the ``embed_net2`` variant of ``old_model.py:99-214`` (third
    stem + NL blocks at fixed indices) without the parsing head.
    """

    class_num: int
    arch: str = "resnet50"
    gm_pool: str = "on"
    no_local: str = "off"
    part: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        self.thermal_module = ResNetStem(self.arch, dtype=self.dtype)
        self.visible_module = ResNetStem(self.arch, dtype=self.dtype)
        self.z_module = ResNetStem(self.arch, dtype=self.dtype)
        if self.no_local == "on":
            from vqvae2_tpu.part.part_model import NLTrunk

            self.nl_trunk = NLTrunk(self.arch, dtype=self.dtype)
        self.base_resnet = ResNetTrunk(self.arch, last_stride_1=True,
                                       dtype=self.dtype)
        self._pool_dim = pool_dim(self.arch)
        if self.part:
            self.part_head = PartHead(self.class_num)
        self.bottleneck = BNNeck()
        self.classifier = nn.Dense(self.class_num, use_bias=False)

    @property
    def feature_dim(self) -> int:
        return 6 * 512 if self.part else self._pool_dim

    def __call__(
        self,
        xRGB: Optional[jax.Array] = None,
        xIR: Optional[jax.Array] = None,
        xZ: Optional[jax.Array] = None,
        modal: int = 0,
        with_feature: bool = False,
        train: bool = False,
    ):
        if self.is_initializing():
            # touch every stem so all three modality branches get parameters
            # regardless of which modal the init call routes through
            probe = next(t for t in (xRGB, xIR, xZ) if t is not None)
            self.visible_module(probe)
            self.thermal_module(probe)
            self.z_module(probe)

        if modal == 0:
            x1 = (self.visible_module(xRGB, train=train) if xRGB is not None
                  else self.z_module(xZ, train=train))
            x2 = self.thermal_module(xIR, train=train)
            x = jnp.concatenate([x1, x2], axis=0)
        elif modal == 1:
            x = self.visible_module(xRGB, train=train)
        elif modal == 2:
            x = self.thermal_module(xIR, train=train)
        elif modal == 3:
            x = self.z_module(xZ, train=train)
        else:
            raise ValueError(f"modal {modal}")

        if self.no_local == "on":
            _, x3, x4 = self.nl_trunk(x, train=train)
        else:
            x3, x4 = self.base_resnet(x, train=train)
        person_mask = compute_mask(x4)

        if self.part:
            feats, logits, feat_all = self.part_head(x4, train=train)
            if train:
                return feats, logits, feat_all
            return l2_normalize(feat_all), l2_normalize(feat_all)

        feat_pool = gem_pool(x4) if self.gm_pool == "on" else avg_pool(x4)
        feat = self.bottleneck(feat_pool, train=train)
        if with_feature:
            return feat_pool, self.classifier(feat), x4, person_mask, x3
        if not train:
            return l2_normalize(feat), l2_normalize(feat_pool)
        return feat_pool, self.classifier(feat)
