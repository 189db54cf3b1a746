"""SSD box machinery — TPU rebuild of reference ``ssd/utils.py`` (dboxes,
encode/decode, NMS; ``:70-282``).

Everything is jit-safe: matching is a vectorized IoU argmax (the reference
loops per box), decode is pure math, and NMS is a fixed-iteration
``lax.while``-free masked loop suitable for compilation (plus a simple numpy
variant for host-side eval).
"""

from __future__ import annotations

import itertools
import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def default_boxes_ssd300(
    fig_size: int = 300,
    feat_sizes: Sequence[int] = (38, 19, 10, 5, 3, 1),
    steps: Sequence[int] = (8, 16, 32, 64, 100, 300),
    scales: Sequence[int] = (21, 45, 99, 153, 207, 261, 315),
    aspect_ratios: Sequence[Sequence[int]] = ((2,), (2, 3), (2, 3), (2, 3), (2,), (2,)),
) -> np.ndarray:
    """SSD300 default boxes in (cx, cy, w, h), normalized (reference
    ``DefaultBoxes``, ssd/utils.py:70-115). Returns (8732, 4) float32."""
    boxes = []
    for idx, sfeat in enumerate(feat_sizes):
        sk1 = scales[idx] / fig_size
        sk2 = scales[idx + 1] / fig_size
        sk3 = math.sqrt(sk1 * sk2)
        all_sizes = [(sk1, sk1), (sk3, sk3)]
        for alpha in aspect_ratios[idx]:
            w, h = sk1 * math.sqrt(alpha), sk1 / math.sqrt(alpha)
            all_sizes.append((w, h))
            all_sizes.append((h, w))
        for w, h in all_sizes:
            for i, j in itertools.product(range(sfeat), repeat=2):
                cx, cy = (j + 0.5) * steps[idx] / fig_size, \
                         (i + 0.5) * steps[idx] / fig_size
                boxes.append((cx, cy, w, h))
    return np.clip(np.asarray(boxes, np.float32), 0.0, 1.0)


def ltrb_from_cxcywh(b):
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def cxcywh_from_ltrb(b):
    l, t, r, bt = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([(l + r) / 2, (t + bt) / 2, r - l, bt - t], axis=-1)


def box_iou(a, b):
    """Pairwise IoU of ltrb boxes: a (N, 4), b (M, 4) → (N, M)."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / jnp.clip(area_a[:, None] + area_b[None, :] - inter,
                            1e-10, None)


def encode_targets(gt_boxes: jax.Array, gt_labels: jax.Array,
                   dboxes_ltrb: jax.Array, dboxes_xywh: jax.Array,
                   criteria: float = 0.5,
                   scale_xy: float = 0.1, scale_wh: float = 0.2):
    """Match ground truth to default boxes and build regression targets
    (reference ``Encoder.encode``, ssd/utils.py:149-190, vectorized).

    gt_boxes: (G, 4) ltrb normalized (pad rows with zeros, label 0).
    Returns (loc_target (D, 4) in scaled cxcywh-offset form, cls_target (D,)).
    """
    ious = box_iou(dboxes_ltrb, gt_boxes)  # (D, G)
    # mask out padded gt (zero-area)
    valid = ((gt_boxes[:, 2] - gt_boxes[:, 0])
             * (gt_boxes[:, 3] - gt_boxes[:, 1])) > 0
    ious = jnp.where(valid[None, :], ious, -1.0)

    best_gt_iou = jnp.max(ious, axis=1)
    best_gt_idx = jnp.argmax(ious, axis=1)

    # force-match: each valid gt claims its best dbox
    best_db_idx = jnp.argmax(ious, axis=0)  # (G,)
    d = dboxes_ltrb.shape[0]
    force = jnp.zeros((d,), bool).at[best_db_idx].set(valid)
    claimed_gt = jnp.zeros((d,), jnp.int32).at[best_db_idx].set(
        jnp.where(valid, jnp.arange(gt_boxes.shape[0]), 0))

    matched = (best_gt_iou > criteria) | force
    gt_idx = jnp.where(force, claimed_gt, best_gt_idx)

    cls_target = jnp.where(matched, gt_labels[gt_idx], 0)
    mb = cxcywh_from_ltrb(gt_boxes[gt_idx])
    loc = jnp.stack([
        (mb[:, 0] - dboxes_xywh[:, 0]) / dboxes_xywh[:, 2] / scale_xy,
        (mb[:, 1] - dboxes_xywh[:, 1]) / dboxes_xywh[:, 3] / scale_xy,
        jnp.log(jnp.clip(mb[:, 2], 1e-8, None) / dboxes_xywh[:, 2]) / scale_wh,
        jnp.log(jnp.clip(mb[:, 3], 1e-8, None) / dboxes_xywh[:, 3]) / scale_wh,
    ], axis=-1)
    loc = jnp.where(matched[:, None], loc, 0.0)
    return loc, cls_target.astype(jnp.int32)


def decode_boxes(loc: jax.Array, dboxes_xywh: jax.Array,
                 scale_xy: float = 0.1, scale_wh: float = 0.2) -> jax.Array:
    """Inverse of :func:`encode_targets` → ltrb (reference ``scale_back_batch``,
    ssd/utils.py:192-218)."""
    cx = loc[..., 0] * scale_xy * dboxes_xywh[:, 2] + dboxes_xywh[:, 0]
    cy = loc[..., 1] * scale_xy * dboxes_xywh[:, 3] + dboxes_xywh[:, 1]
    w = jnp.exp(loc[..., 2] * scale_wh) * dboxes_xywh[:, 2]
    h = jnp.exp(loc[..., 3] * scale_wh) * dboxes_xywh[:, 3]
    return ltrb_from_cxcywh(jnp.stack([cx, cy, w, h], axis=-1))


def nms_numpy(boxes: np.ndarray, scores: np.ndarray,
              iou_threshold: float = 0.45, max_out: int = 200) -> np.ndarray:
    """Host-side greedy NMS over ltrb boxes → kept indices (reference
    ``Encoder.decode_single`` NMS loop, ssd/utils.py:222-260)."""
    order = np.argsort(-scores)
    keep: List[int] = []
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    while len(order) and len(keep) < max_out:
        i = order[0]
        keep.append(int(i))
        if len(order) == 1:
            break
        rest = order[1:]
        lt = np.maximum(boxes[i, :2], boxes[rest, :2])
        rb = np.minimum(boxes[i, 2:], boxes[rest, 2:])
        wh = np.clip(rb - lt, 0, None)
        inter = wh[:, 0] * wh[:, 1]
        iou = inter / np.clip(areas[i] + areas[rest] - inter, 1e-10, None)
        order = rest[iou <= iou_threshold]
    return np.asarray(keep, np.int64)


def multibox_loss(loc_pred: jax.Array, cls_logits: jax.Array,
                  loc_target: jax.Array, cls_target: jax.Array,
                  neg_pos_ratio: int = 3) -> jax.Array:
    """SSD MultiBox loss with hard negative mining (reference ``Loss``,
    ssd/model.py:133-196): smooth-L1 over positives + CE with the 3:1
    hardest negatives, normalized by positive count.

    Shapes: loc (B, D, 4), cls_logits (B, D, C), cls_target (B, D).
    """
    pos = cls_target > 0
    num_pos = jnp.sum(pos, axis=1)

    diff = loc_pred - loc_target
    sl1 = jnp.where(jnp.abs(diff) < 1.0, 0.5 * diff * diff,
                    jnp.abs(diff) - 0.5).sum(-1)
    loc_loss = jnp.sum(sl1 * pos, axis=1)

    ce = -jax.nn.log_softmax(cls_logits, axis=-1)
    ce_gt = jnp.take_along_axis(ce, cls_target[..., None], axis=-1)[..., 0]

    # hard negative mining: rank background CE among negatives
    con_neg = jnp.where(pos, 0.0, ce_gt)
    rank = jnp.argsort(jnp.argsort(-con_neg, axis=1), axis=1)
    num_neg = jnp.clip(neg_pos_ratio * num_pos, 0,
                       cls_target.shape[1] - 1)[:, None]
    neg = rank < num_neg

    cls_loss = jnp.sum(ce_gt * (pos | neg), axis=1)
    total = loc_loss + cls_loss
    denom = jnp.clip(num_pos.astype(total.dtype), 1e-6, None)
    return jnp.mean(jnp.where(num_pos > 0, total / denom, 0.0))
