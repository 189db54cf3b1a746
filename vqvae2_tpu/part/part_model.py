"""ReID + human-part parsing hybrid — TPU rebuild of reference
``part/part_model.py`` and ``part/part_detector.py``: the PSP context
encoder, edge branch, parsing decoder (all on the fused inplace-ABN), the
interleaved self-Non-local trunk, and ``embed_net2`` with per-part
descriptors pooled through the predicted part masks.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vqvae2_tpu.models.abn import InPlaceABN
from vqvae2_tpu.models.layers import gem_pool, avg_pool, l2_normalize
from vqvae2_tpu.models.resnet import CONFIGS, ResNetStem, _make_layer, pool_dim

Dtype = Any


def _resize(x: jax.Array, hw: Tuple[int, int]) -> jax.Array:
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, hw[0], hw[1], c), method="bilinear")


def _adaptive_avg_pool(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """AdaptiveAvgPool2d equivalent for divisible grids (PSP priors)."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    # resize-based fallback when not divisible (torch uses uneven bins)
    if h % oh == 0 and w % ow == 0:
        return x.reshape(b, oh, h // oh, ow, w // ow, c).mean(axis=(2, 4))
    return jax.image.resize(x, (b, oh, ow, c), method="linear")


class NonLocalSelf(nn.Module):
    """Self non-local block (reference ``part/part_model.py:15-68``): note the
    reference's quirk ``inter_channels = reduc_ratio // reduc_ratio == 1`` and
    the un-normalized ``f / N`` attention (softmax commented out) — both
    mirrored here."""

    inter_channels: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        b, h, w, c = x.shape
        inter = self.inter_channels
        g = nn.Conv(inter, (1, 1), dtype=self.dtype, name="g")(x).reshape(b, h * w, inter)
        theta = nn.Conv(inter, (1, 1), dtype=self.dtype, name="theta")(x).reshape(b, h * w, inter)
        phi = nn.Conv(inter, (1, 1), dtype=self.dtype, name="phi")(x).reshape(b, h * w, inter)
        f = jnp.einsum("bqi,bki->bqk", theta, phi)
        y = jnp.einsum("bqk,bki->bqi", f / f.shape[-1], g).reshape(b, h, w, inter)
        w_y = nn.Conv(c, (1, 1), dtype=self.dtype, name="W_conv")(y)
        w_y = nn.BatchNorm(use_running_average=not train,
                           scale_init=nn.initializers.zeros,
                           bias_init=nn.initializers.zeros, name="W_bn")(w_y)
        return w_y + x


class ConvABN(nn.Module):
    """conv(bias=False) + InPlaceABN(leaky 0.01) — the ubiquitous pair in the
    parsing heads (part_detector.py throughout)."""

    features: int
    kernel: Tuple[int, int] = (1, 1)
    dilation: int = 1
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        pad = ((self.kernel[0] // 2) * self.dilation,) * 2
        h = nn.Conv(self.features, self.kernel, use_bias=False,
                    padding=[pad, pad] if self.kernel[0] > 1 else "VALID",
                    kernel_dilation=(self.dilation, self.dilation),
                    dtype=self.dtype)(x)
        return InPlaceABN(self.features, axis_name=self.axis_name)(h, train=train)


class PSPModule(nn.Module):
    """Pyramid scene parsing context (reference part_detector.py:9-37)."""

    out_features: int = 512
    sizes: Sequence[int] = (1, 2, 3, 6)
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h, w = x.shape[1:3]
        priors = []
        for i, size in enumerate(self.sizes):
            p = _adaptive_avg_pool(x, (size, size))
            p = ConvABN(self.out_features, (1, 1), axis_name=self.axis_name,
                        dtype=self.dtype, name=f"stage{i}")(p, train=train)
            priors.append(_resize(p, (h, w)))
        priors.append(x)
        cat = jnp.concatenate(priors, axis=-1)
        return ConvABN(self.out_features, (3, 3), axis_name=self.axis_name,
                       dtype=self.dtype, name="bottleneck")(cat, train=train)


class ASPPModule(nn.Module):
    """Atrous pyramid (reference part_detector.py:40-87) — kept for parity."""

    inner_features: int = 256
    out_features: int = 512
    dilations: Sequence[int] = (12, 24, 36)
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h, w = x.shape[1:3]
        f1 = _adaptive_avg_pool(x, (1, 1))
        f1 = ConvABN(self.inner_features, (1, 1), axis_name=self.axis_name,
                     dtype=self.dtype, name="conv1")(f1, train=train)
        f1 = _resize(f1, (h, w))
        feats = [f1,
                 ConvABN(self.inner_features, (1, 1), axis_name=self.axis_name,
                         dtype=self.dtype, name="conv2")(x, train=train)]
        for i, d in enumerate(self.dilations):
            feats.append(ConvABN(self.inner_features, (3, 3), dilation=d,
                                 axis_name=self.axis_name, dtype=self.dtype,
                                 name=f"conv{i+3}")(x, train=train))
        cat = jnp.concatenate(feats, axis=-1)
        out = ConvABN(self.out_features, (1, 1), axis_name=self.axis_name,
                      dtype=self.dtype, name="bottleneck")(cat, train=train)
        return nn.Dropout(0.1, deterministic=not train)(out)


class EdgeModule(nn.Module):
    """Edge branch over (layer1, layer2, layer3) features (reference
    part_detector.py:90-130). The 3×3 logit conv is SHARED across scales
    (conv4 reused three times in the reference)."""

    mid_fea: int = 256
    out_fea: int = 2
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, x3, train: bool = False):
        h, w = x1.shape[1:3]
        conv4 = nn.Conv(self.out_fea, (3, 3), padding="SAME", dtype=self.dtype,
                        name="conv4")
        fea1 = ConvABN(self.mid_fea, axis_name=self.axis_name,
                       dtype=self.dtype, name="conv1")(x1, train=train)
        fea2 = ConvABN(self.mid_fea, axis_name=self.axis_name,
                       dtype=self.dtype, name="conv2")(x2, train=train)
        fea3 = ConvABN(self.mid_fea, axis_name=self.axis_name,
                       dtype=self.dtype, name="conv3")(x3, train=train)
        e1, e2, e3 = conv4(fea1), conv4(fea2), conv4(fea3)
        fea2, fea3 = _resize(fea2, (h, w)), _resize(fea3, (h, w))
        e2, e3 = _resize(e2, (h, w)), _resize(e3, (h, w))
        edge = jnp.concatenate([e1, e2, e3], axis=-1)
        edge_fea = jnp.concatenate([fea1, fea2, fea3], axis=-1)
        edge = nn.Conv(self.out_fea, (1, 1), dtype=self.dtype, name="conv5")(edge)
        return edge, edge_fea


class DecoderModule(nn.Module):
    """Parsing decoder (reference part_detector.py:132-165)."""

    num_classes: int
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xt: jax.Array, xl: jax.Array, train: bool = False):
        h, w = xl.shape[1:3]
        xt = ConvABN(256, axis_name=self.axis_name, dtype=self.dtype,
                     name="conv1")(xt, train=train)
        xt = _resize(xt, (h, w))
        xl = ConvABN(48, axis_name=self.axis_name, dtype=self.dtype,
                     name="conv2")(xl, train=train)
        x = jnp.concatenate([xt, xl], axis=-1)
        x = ConvABN(256, axis_name=self.axis_name, dtype=self.dtype,
                    name="conv3a")(x, train=train)
        x = ConvABN(256, axis_name=self.axis_name, dtype=self.dtype,
                    name="conv3b")(x, train=train)
        seg = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                      name="conv4")(x)
        return seg, x


class PartModel(nn.Module):
    """Parsing head: PSP context + decoder + edge + fusion (reference
    part_model.py:263-286).  Returns ``([[parsing, fusion], [edge]], fused_fea)``."""

    num_part: int
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x4, x1, x2, x3, train: bool = False):
        ctx = PSPModule(512, axis_name=self.axis_name, dtype=self.dtype,
                        name="context_encoding")(x4, train=train)
        parsing, parsing_fea = DecoderModule(
            self.num_part, axis_name=self.axis_name, dtype=self.dtype,
            name="decoder")(ctx, x1, train=train)
        edge, edge_fea = EdgeModule(axis_name=self.axis_name, dtype=self.dtype,
                                    name="edge")(x1, x2, x3, train=train)
        x = jnp.concatenate([parsing_fea, edge_fea], axis=-1)
        h = ConvABN(256, axis_name=self.axis_name, dtype=self.dtype,
                    name="fusion_abn")(x, train=train)
        h = nn.Dropout(0.1, deterministic=not train)(h)
        fusion = nn.Conv(self.num_part, (1, 1), dtype=self.dtype,
                         name="fusion_out")(h)
        return [[parsing, fusion], [edge]], x


class NLTrunk(nn.Module):
    """layer2-4 with interleaved self-Non-local blocks at the reference's
    fixed indices (part_model.py:116-130: non_layers=[0,2,3,0] over
    layers=[3,4,6,3]) and last-stride-1 layer4."""

    arch: str = "resnet50"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        cfg = CONFIGS[self.arch]
        layers = cfg["layers"]
        expansion = 1 if cfg["block"] == "basic" else 4
        non_layers = [0, 2, 3, 0]
        nl2_idx = sorted(layers[1] - (i + 1) for i in range(non_layers[1]))
        nl3_idx = sorted(layers[2] - (i + 1) for i in range(non_layers[2]))

        h = x
        blocks2 = _make_layer(cfg["block"], 128, layers[1], 2, 64 * expansion,
                              self.dtype, "layer2")
        nl2 = 0
        for i, blk in enumerate(blocks2):
            h = blk(h, train=train)
            if i in nl2_idx:
                h = NonLocalSelf(dtype=self.dtype, name=f"NL2_{nl2}")(h, train=train)
                nl2 += 1
        x2 = h
        blocks3 = _make_layer(cfg["block"], 256, layers[2], 2, 128 * expansion,
                              self.dtype, "layer3")
        nl3 = 0
        for i, blk in enumerate(blocks3):
            h = blk(h, train=train)
            if i in nl3_idx:
                h = NonLocalSelf(dtype=self.dtype, name=f"NL3_{nl3}")(h, train=train)
                nl3 += 1
        x3 = h
        blocks4 = _make_layer(cfg["block"], 512, layers[3], 1, 256 * expansion,
                              self.dtype, "layer4")
        for blk in blocks4:
            h = blk(h, train=train)
        return x2, x3, h


class EmbedNet2(nn.Module):
    """ReID + parsing hybrid (reference ``embed_net2``, part_model.py:104-259).

    Training forward returns the reference's 10-tuple:
    ``(feats, score, part_preds, loss_reg(None), maskedFeatX3, maskedFeat,
    part_masks, partsScore, featsP, scoreP)``.
    """

    class_num: int
    arch: str = "resnet50"
    gm_pool: str = "on"
    part_num: int = 7
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    def setup(self):
        self.thermal_module = ResNetStem(self.arch, dtype=self.dtype)
        self.visible_module = ResNetStem(self.arch, dtype=self.dtype)
        self.gray_module = ResNetStem(self.arch, dtype=self.dtype)
        self.trunk = NLTrunk(self.arch, dtype=self.dtype)
        self._pool = pool_dim(self.arch)
        self.bottleneck = nn.BatchNorm(use_bias=False)
        self.part = PartModel(self.part_num, axis_name=self.axis_name,
                              dtype=self.dtype)
        self.part_descriptor = [
            (nn.Dense(512, name=f"pd{i}_0"), nn.Dense(256, name=f"pd{i}_1"))
            for i in range(self.part_num - 1)
        ]
        self.cls_parts = [
            (nn.BatchNorm(name=f"clsP{i}_bn"),
             nn.Dense(self.class_num, name=f"clsP{i}_fc"))
            for i in range(self.part_num - 1)
        ]
        self.classifier = nn.Dense(self.class_num, use_bias=False)
        self.classifierP = nn.Dense(self.class_num, use_bias=False)

    def __call__(self, xRGB=None, xIR=None, xZ=None, modal: int = 0,
                 with_feature: bool = False, train: bool = False):
        if self.is_initializing():
            probe = next(t for t in (xRGB, xIR, xZ) if t is not None)
            self.visible_module(probe)
            self.thermal_module(probe)
            self.gray_module(probe)

        if modal == 0:
            x1 = (self.visible_module(xRGB, train=train) if xRGB is not None
                  else self.gray_module(xZ, train=train))
            x2 = self.thermal_module(xIR, train=train)
            x = jnp.concatenate([x1, x2], axis=0)
            if xZ is not None and xRGB is not None:
                x = jnp.concatenate([x, self.gray_module(xZ, train=train)], axis=0)
        elif modal == 1:
            x = self.visible_module(xRGB, train=train)
        elif modal == 2:
            x = self.thermal_module(xIR, train=train)
        elif modal == 3:
            x = self.gray_module(xZ, train=train)
        else:
            raise ValueError(f"modal {modal}")

        x1f = x
        x2f, x3f, x4f = self.trunk(x, train=train)

        part_preds, _ = self.part(x4f, x1f, x2f, x3f, train=train)
        # part_masks: softmax(avg_pool4(fusion + fusion)) (part_model.py:222)
        fusion = part_preds[0][1]
        pooled = nn.avg_pool(fusion + fusion, (4, 4), strides=(4, 4))
        part_masks = jax.nn.softmax(pooled, axis=-1)  # (B, h, w, P)

        b, h, w, c = x4f.shape
        x_pool = gem_pool(x4f) if self.gm_pool == "on" else avg_pool(x4f)
        feat_g = self.bottleneck(x_pool, use_running_average=not train)

        # mask-pooled per-part features (einsum over NHWC; reference
        # part_model.py:236-237 is NCHW 'brhw,bchw->brc')
        pm = part_masks[..., 1:]  # drop background
        # part grid is x4 grid /4 — upsample masks back to x4 resolution
        pm = _resize(pm, (h, w))
        masked_feat = jnp.einsum("bhwr,bhwc->brc", pm, x4f) / (h * w)
        masked_feat_x3 = jnp.einsum("bhwr,bhwc->brc", _resize(pm, x3f.shape[1:3]),
                                    x3f) / (x3f.shape[1] * x3f.shape[2])

        parts_score, feats_p = [], []
        for i in range(self.part_num - 1):
            d0, d1 = self.part_descriptor[i]
            f = d1(d0(masked_feat[:, i]))
            feats_p.append(f)
            bn, fc = self.cls_parts[i]
            parts_score.append(fc(bn(masked_feat[:, i],
                                     use_running_average=not train)))
        feats_p = jnp.concatenate(feats_p, axis=-1)
        score_p = self.classifierP(feats_p)
        feats = jnp.concatenate([feat_g, feats_p], axis=-1)
        score = self.classifier(feats)

        if with_feature or train:
            return (feats, score, part_preds, None, masked_feat_x3,
                    masked_feat, part_masks, parts_score, feats_p, score_p)
        return l2_normalize(x_pool), l2_normalize(feats)
