"""Mask R-CNN — TPU rebuild of the capability exercised by reference
``fashion.py`` (torchvision ``maskrcnn_resnet50_fpn_v2`` with replaced box and
mask predictors, fashion.py:112-123, trained on ModaNet COCO with masks).

TPU-first redesign notes (torchvision's implementation is dynamic-shape
host-logic heavy; none of that survives jit):

* **Static shapes end to end**: every image carries a fixed ``max_boxes`` GT
  pad; RPN keeps a fixed ``num_proposals`` top-K per image (no NMS inside the
  training graph — score top-K is the standard static-shape substitute); RoI
  batches are fixed-size with validity masks.
* **RoIAlign as vmapped bilinear sampling** over a fixed output grid —
  a gather-based kernel XLA fuses, instead of torchvision's CUDA op.
* **Light FPN** over the shared ResNet trunk (lateral 1×1 + nearest top-down
  + 3×3 smoothing).
* Inference-time NMS and mask pasting run on host (numpy), like every
  deployment of this family.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vqvae2_tpu.detection import boxes as B
from vqvae2_tpu.models.resnet import CONFIGS, ResNetStem, _make_layer

Dtype = Any


# ---------------------------------------------------------------------------
# Anchors
# ---------------------------------------------------------------------------

def generate_anchors(img_size: int, strides: Sequence[int] = (4, 8, 16),
                     sizes: Sequence[int] = (32, 64, 128),
                     ratios: Sequence[float] = (0.5, 1.0, 2.0)) -> np.ndarray:
    """Multi-level anchor grid in normalized ltrb; (A, 4).  Default strides
    match the FPN levels (p2/p3/p4 sit at 4×/8×/16× of the input)."""
    out = []
    for stride, size in zip(strides, sizes):
        feat = img_size // stride
        cy, cx = np.meshgrid(
            (np.arange(feat) + 0.5) * stride / img_size,
            (np.arange(feat) + 0.5) * stride / img_size, indexing="ij")
        for r in ratios:
            h = size * np.sqrt(r) / img_size
            w = size / np.sqrt(r) / img_size
            out.append(np.stack([cx - w / 2, cy - h / 2, cx + w / 2,
                                 cy + h / 2], axis=-1).reshape(-1, 4))
    return np.concatenate(out, axis=0).astype(np.float32)


def _anchor_xywh(anchors: jax.Array) -> jax.Array:
    return B.cxcywh_from_ltrb(anchors)


# ---------------------------------------------------------------------------
# RoIAlign (vmapped bilinear sampling)
# ---------------------------------------------------------------------------

def roi_align(feat: jax.Array, boxes_ltrb: jax.Array, out_size: int) -> jax.Array:
    """feat (H, W, C), boxes (N, 4) normalized ltrb → (N, out, out, C)."""
    h, w, c = feat.shape

    def one(box):
        ys = jnp.linspace(box[1], box[3], out_size) * (h - 1)
        xs = jnp.linspace(box[0], box[2], out_size) * (w - 1)
        y0 = jnp.clip(jnp.floor(ys), 0, h - 2).astype(jnp.int32)
        x0 = jnp.clip(jnp.floor(xs), 0, w - 2).astype(jnp.int32)
        wy = jnp.clip(ys - y0, 0.0, 1.0)
        wx = jnp.clip(xs - x0, 0.0, 1.0)
        f00 = feat[y0][:, x0]          # (out, out, C)
        f01 = feat[y0][:, x0 + 1]
        f10 = feat[y0 + 1][:, x0]
        f11 = feat[y0 + 1][:, x0 + 1]
        wy_ = wy[:, None, None]
        wx_ = wx[None, :, None]
        return (f00 * (1 - wy_) * (1 - wx_) + f01 * (1 - wy_) * wx_
                + f10 * wy_ * (1 - wx_) + f11 * wy_ * wx_)

    return jax.vmap(one)(boxes_ltrb)


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------

class LightFPN(nn.Module):
    """Lateral 1×1 + top-down nearest + 3×3 smooth over (C2, C3, C4)."""

    channels: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, c2, c3, c4, train: bool = False):
        p4 = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="lat4")(c4)
        p3 = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="lat3")(c3)
        p2 = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="lat2")(c2)

        def up(x, like):
            b, h, w, ch = like.shape
            return jax.image.resize(x, (x.shape[0], h, w, ch), "nearest")

        p3 = p3 + up(p4, p3)
        p2 = p2 + up(p3, p2)
        smooth = lambda x, n: nn.Conv(self.channels, (3, 3), padding="SAME",
                                      dtype=self.dtype, name=n)(x)
        return smooth(p2, "s2"), smooth(p3, "s3"), smooth(p4, "s4")


class RPNHead(nn.Module):
    num_anchors_per_loc: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        conv = nn.Conv(feats[0].shape[-1], (3, 3), padding="SAME",
                       dtype=self.dtype, name="conv")
        obj_head = nn.Conv(self.num_anchors_per_loc, (1, 1), dtype=self.dtype,
                           name="obj")
        reg_head = nn.Conv(self.num_anchors_per_loc * 4, (1, 1),
                           dtype=self.dtype, name="reg")
        objs, regs = [], []
        for f in feats:
            h = nn.relu(conv(f))
            b = f.shape[0]
            objs.append(obj_head(h).reshape(b, -1))
            regs.append(reg_head(h).reshape(b, -1, 4))
        return jnp.concatenate(objs, 1), jnp.concatenate(regs, 1)


class BoxHead(nn.Module):
    num_classes: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, rois):  # (N, 7, 7, C)
        h = rois.reshape(rois.shape[0], -1)
        h = nn.relu(nn.Dense(256, dtype=self.dtype)(h))
        h = nn.relu(nn.Dense(256, dtype=self.dtype)(h))
        cls = nn.Dense(self.num_classes, dtype=self.dtype, name="cls")(h)
        reg = nn.Dense(4, dtype=self.dtype, name="reg")(h)
        return cls, reg


class MaskHead(nn.Module):
    num_classes: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, rois):  # (N, 14, 14, C) -> (N, 28, 28, num_classes)
        h = rois
        for i in range(2):
            h = nn.relu(nn.Conv(128, (3, 3), padding="SAME",
                                dtype=self.dtype, name=f"conv{i}")(h))
        n, hh, ww, ch = h.shape
        h = jax.image.resize(h, (n, hh * 2, ww * 2, ch), "nearest")
        h = nn.relu(nn.Conv(128, (3, 3), padding="SAME", dtype=self.dtype,
                            name="up_conv")(h))
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="mask_out")(h)


class MaskRCNN(nn.Module):
    """End-to-end jit-able Mask R-CNN (static shapes throughout)."""

    num_classes: int
    img_size: int = 256
    num_proposals: int = 64
    arch: str = "resnet18"
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = CONFIGS[self.arch]
        self.stem = ResNetStem(self.arch, dtype=self.dtype)
        expansion = 1 if cfg["block"] == "basic" else 4
        self.layer2 = _make_layer(cfg["block"], 128, cfg["layers"][1], 2,
                                  64 * expansion, self.dtype, "layer2")
        self.layer3 = _make_layer(cfg["block"], 256, cfg["layers"][2], 2,
                                  128 * expansion, self.dtype, "layer3")
        self.fpn = LightFPN(dtype=self.dtype)
        self.rpn = RPNHead(dtype=self.dtype)
        self.box_head = BoxHead(self.num_classes, dtype=self.dtype)
        self.mask_head = MaskHead(self.num_classes, dtype=self.dtype)

    def backbone(self, x, train: bool = False):
        h = nn.relu(self.stem(x, train=train))
        c2 = h
        for blk in self.layer2:
            h = blk(h, train=train)
        c3 = h
        for blk in self.layer3:
            h = blk(h, train=train)
        c4 = h
        return self.fpn(c2, c3, c4, train=train)

    def __call__(self, images, train: bool = False):
        """Returns (rpn_obj, rpn_reg, proposals, p2) — heads run separately on
        the proposals via :meth:`roi_outputs` so training can sample RoIs."""
        p2, p3, p4 = self.backbone(images, train=train)
        rpn_obj, rpn_reg = self.rpn((p2, p3, p4))
        return rpn_obj, rpn_reg, p2

    def roi_outputs(self, p2, rois_ltrb, train: bool = False):
        """rois (B, N, 4) → (cls (B, N, C), reg (B, N, 4), masks (B, N, 28, 28, C))."""
        def per_image(feat, rois):
            box_feat = roi_align(feat, rois, 7)
            cls, reg = self.box_head(box_feat)
            mask_feat = roi_align(feat, rois, 14)
            masks = self.mask_head(mask_feat)
            return cls, reg, masks

        return jax.vmap(per_image)(p2, rois_ltrb)


# ---------------------------------------------------------------------------
# Target assignment + losses (pure functions, static shapes)
# ---------------------------------------------------------------------------

def rpn_targets(anchors: jax.Array, gt_boxes: jax.Array, gt_labels: jax.Array,
                pos_iou: float = 0.5, neg_iou: float = 0.3):
    """Per-anchor objectness target (1 pos / 0 neg / -1 ignore) + box deltas."""
    ious = B.box_iou(anchors, gt_boxes)
    valid = ((gt_boxes[:, 2] - gt_boxes[:, 0])
             * (gt_boxes[:, 3] - gt_boxes[:, 1])) > 0
    ious = jnp.where(valid[None, :], ious, -1.0)
    best_iou = jnp.max(ious, axis=1)
    best_gt = jnp.argmax(ious, axis=1)
    # force-match each gt's best anchor
    best_anchor = jnp.argmax(ious, axis=0)
    force = jnp.zeros(anchors.shape[0], bool).at[best_anchor].set(valid)

    obj = jnp.where(best_iou >= pos_iou, 1, jnp.where(best_iou < neg_iou, 0, -1))
    obj = jnp.where(force, 1, obj)
    axywh = _anchor_xywh(anchors)
    mb = B.cxcywh_from_ltrb(gt_boxes[best_gt])
    deltas = jnp.stack([
        (mb[:, 0] - axywh[:, 0]) / axywh[:, 2],
        (mb[:, 1] - axywh[:, 1]) / axywh[:, 3],
        jnp.log(jnp.clip(mb[:, 2], 1e-6, None) / axywh[:, 2]),
        jnp.log(jnp.clip(mb[:, 3], 1e-6, None) / axywh[:, 3]),
    ], axis=-1)
    # bound the regression targets: a force-matched anchor far from its gt
    # can otherwise produce huge deltas that blow up the smooth-L1 loss
    return obj, jnp.clip(deltas, -4.0, 4.0)


def decode_proposals(anchors: jax.Array, rpn_obj: jax.Array,
                     rpn_reg: jax.Array, k: int):
    """Top-K scored anchors decoded to boxes (the static-shape stand-in for
    train-time NMS)."""
    axywh = _anchor_xywh(anchors)

    def per_image(obj, reg):
        score, idx = jax.lax.top_k(obj, k)
        a = axywh[idx]
        r = reg[idx]
        cx = r[:, 0] * a[:, 2] + a[:, 0]
        cy = r[:, 1] * a[:, 3] + a[:, 1]
        w = jnp.exp(jnp.clip(r[:, 2], -4, 4)) * a[:, 2]
        h = jnp.exp(jnp.clip(r[:, 3], -4, 4)) * a[:, 3]
        boxes = B.ltrb_from_cxcywh(jnp.stack([cx, cy, w, h], -1))
        return jnp.clip(boxes, 0.0, 1.0), score

    return jax.vmap(per_image)(rpn_obj, rpn_reg)


def roi_targets(proposals: jax.Array, gt_boxes: jax.Array,
                gt_labels: jax.Array, pos_iou: float = 0.5):
    """Per-proposal class target (0 = background), box deltas, matched gt idx."""
    ious = B.box_iou(proposals, gt_boxes)
    valid = ((gt_boxes[:, 2] - gt_boxes[:, 0])
             * (gt_boxes[:, 3] - gt_boxes[:, 1])) > 0
    ious = jnp.where(valid[None, :], ious, -1.0)
    best_iou = jnp.max(ious, axis=1)
    best_gt = jnp.argmax(ious, axis=1)
    labels = jnp.where(best_iou >= pos_iou, gt_labels[best_gt], 0)

    pxywh = B.cxcywh_from_ltrb(proposals)
    mb = B.cxcywh_from_ltrb(gt_boxes[best_gt])
    deltas = jnp.stack([
        (mb[:, 0] - pxywh[:, 0]) / jnp.clip(pxywh[:, 2], 1e-4, None),
        (mb[:, 1] - pxywh[:, 1]) / jnp.clip(pxywh[:, 3], 1e-4, None),
        jnp.log(jnp.clip(mb[:, 2], 1e-6, None) / jnp.clip(pxywh[:, 2], 1e-4, None)),
        jnp.log(jnp.clip(mb[:, 3], 1e-6, None) / jnp.clip(pxywh[:, 3], 1e-4, None)),
    ], axis=-1)
    # bound targets (thin/degenerate proposals otherwise yield deltas in the
    # hundreds through the 1e-4 clip and destabilize the whole step)
    return labels.astype(jnp.int32), jnp.clip(deltas, -4.0, 4.0), best_gt


def crop_gt_masks(gt_masks: jax.Array, gt_idx: jax.Array,
                  proposals: jax.Array, out: int = 28) -> jax.Array:
    """Crop each proposal's matched GT mask to the proposal window at
    (out, out) — the mask-head BCE target."""
    def one(mask, box):
        return roi_align(mask[:, :, None].astype(jnp.float32), box[None],
                         out)[0, :, :, 0]

    return jax.vmap(one)(gt_masks[gt_idx], proposals)


def _smooth_l1(x):
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def mask_rcnn_loss(rpn_obj, rpn_reg, obj_t, delta_t,
                   roi_cls, roi_reg, roi_labels, roi_deltas,
                   mask_logits, mask_targets):
    """Combined RPN + RoI + mask losses (all masked static-shape reductions)."""
    pos = obj_t == 1
    valid = obj_t >= 0
    obj_bce = optax_sigmoid_bce(rpn_obj, (obj_t == 1).astype(rpn_obj.dtype))
    rpn_cls_loss = jnp.sum(obj_bce * valid) / jnp.maximum(jnp.sum(valid), 1.0)
    rpn_reg_loss = jnp.sum(_smooth_l1(rpn_reg - delta_t).sum(-1) * pos) \
        / jnp.maximum(jnp.sum(pos), 1.0)

    import optax

    # Balanced RoI classification: with ~1-3 positives among 64+ RoIs a plain
    # mean collapses the classifier to background (softmax scores ~1e-9 at
    # eval).  torchvision samples 512 RoIs at a 25% positive fraction
    # (fg_bg_sampler); the static-shape equivalent is to reweight the CE to
    # that same 1:3 effective ratio instead of subsampling.
    ce = optax.softmax_cross_entropy_with_integer_labels(roi_cls, roi_labels)
    roi_pos = roi_labels > 0
    n_pos = jnp.maximum(jnp.sum(roi_pos), 1.0)
    n_neg = jnp.maximum(jnp.sum(~roi_pos), 1.0)
    roi_ce = (0.25 * jnp.sum(ce * roi_pos) / n_pos
              + 0.75 * jnp.sum(ce * ~roi_pos) / n_neg)
    roi_reg_loss = jnp.sum(_smooth_l1(roi_reg - roi_deltas).sum(-1) * roi_pos) \
        / jnp.maximum(jnp.sum(roi_pos), 1.0)

    # mask BCE on the predicted class channel of positive RoIs
    cls_idx = roi_labels[..., None, None, None]
    pred = jnp.take_along_axis(mask_logits, cls_idx, axis=-1)[..., 0]
    mask_bce = optax_sigmoid_bce(pred, mask_targets)
    mask_loss = jnp.sum(mask_bce.mean(axis=(-1, -2)) * roi_pos) \
        / jnp.maximum(jnp.sum(roi_pos), 1.0)

    total = rpn_cls_loss + rpn_reg_loss + roi_ce + roi_reg_loss + mask_loss
    return total, {"rpn_cls": rpn_cls_loss, "rpn_reg": rpn_reg_loss,
                   "roi_cls": roi_ce, "roi_reg": roi_reg_loss,
                   "mask": mask_loss, "loss": total}


def optax_sigmoid_bce(logits, targets):
    import optax

    return optax.sigmoid_binary_cross_entropy(logits, targets)
