"""Parsing criterion stack — jit-safe TPU rebuilds of reference
``part/criterion.py`` and ``part/sup_con_loss.py``.

Components: masked cross-entropy with ignore_index, edge-weighted CE,
:func:`generate_edge` (4-direction label-boundary extraction + dilation,
criterion.py:176-211), parsing↔edge consistency regularization
(criterion.py:22-37), KL distillation (criterion.py:56-67), the part-wise
InfoNCE :func:`contrastive_loss` (criterion.py:214-237), Khosla
:func:`sup_con_loss` (sup_con_loss.py:11-100), and :class:`CriterionAll`
(CE + Lovasz at 2 scales + weighted edge CE + consistency,
criterion.py:70-138)."""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from vqvae2_tpu.part.lovasz import lovasz_softmax

IGNORE = 255


def masked_cross_entropy(logits: jax.Array, labels: jax.Array,
                         ignore: int = IGNORE,
                         class_weights: Optional[jax.Array] = None) -> jax.Array:
    """CE with ignore_index + optional per-class weights (torch semantics:
    weighted mean = Σ wᵢ·ceᵢ / Σ wᵢ over valid pixels)."""
    c = logits.shape[-1]
    lab = labels.reshape(-1)
    valid = lab != ignore
    lab_safe = jnp.where(valid, lab, 0)
    logp = jax.nn.log_softmax(logits.reshape(-1, c), axis=-1)
    ce = -jnp.take_along_axis(logp, lab_safe[:, None], axis=1)[:, 0]
    if class_weights is not None:
        w = class_weights[lab_safe] * valid
    else:
        w = valid.astype(ce.dtype)
    return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1e-12)


def generate_edge(label: jax.Array, edge_width: int = 3) -> jax.Array:
    """Label-boundary map (reference ``generate_edge_tensor``,
    criterion.py:176-211): a pixel is edge if it differs from its
    down/right/down-right/down-left neighbor (both non-ignore), then dilated
    with an edge_width box filter.  label: (B, H, W) int → float {0,1}."""
    lab = label.astype(jnp.int32)
    b, h, w = lab.shape

    def diff(a, bb):
        return ((a != bb) & (a != IGNORE) & (bb != IGNORE)).astype(jnp.float32)

    # pad each directional diff back to (b, h, w) and take the elementwise
    # max — pure pad+maximum fuses into one elementwise kernel, where the
    # previous .at[slice].max form lowered to four scatters
    pad = lambda x, hpad, wpad: jnp.pad(x, ((0, 0), hpad, wpad))
    edge = jnp.maximum(
        jnp.maximum(
            pad(diff(lab[:, 1:, :], lab[:, :-1, :]), (1, 0), (0, 0)),
            pad(diff(lab[:, :, :-1], lab[:, :, 1:]), (0, 0), (0, 1))),
        jnp.maximum(
            pad(diff(lab[:, :-1, :-1], lab[:, 1:, 1:]), (0, 1), (0, 1)),
            pad(diff(lab[:, :-1, 1:], lab[:, 1:, :-1]), (0, 1), (1, 0))))

    # dilation: box conv (padding 1 like the reference, so width-3 default)
    k = jnp.ones((edge_width, edge_width, 1, 1), jnp.float32)
    e = jax.lax.conv_general_dilated(
        edge[..., None], k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., 0]
    return (e != 0).astype(jnp.float32)


def consistency_loss(parsing_logits: jax.Array, edge_logits: jax.Array,
                     label: jax.Array, ignore: int = IGNORE) -> jax.Array:
    """Parsing↔edge consistency (reference ``ConsistencyLoss``,
    criterion.py:22-37): smooth-L1 between edges generated from the predicted
    parsing and the predicted edge, over valid positive-union pixels."""
    pred = jnp.argmax(parsing_logits, axis=-1)
    pred = jnp.where(label == ignore, ignore, pred)
    gen_edge = generate_edge(pred)
    edge_pred = jnp.argmax(edge_logits, axis=-1).astype(jnp.float32)
    valid = (label != ignore)
    pos_union = (gen_edge == 1) & (edge_pred == 1) & valid
    diff = gen_edge - edge_pred
    # smooth_l1 elementwise (|d|<1 → .5d²)
    sl1 = jnp.where(jnp.abs(diff) < 1.0, 0.5 * diff * diff,
                    jnp.abs(diff) - 0.5)
    denom = jnp.sum(pos_union)
    return jnp.where(denom > 0,
                     jnp.sum(sl1 * pos_union) / jnp.maximum(denom, 1.0), 0.0)


def kl_divergence_loss(student_logits: jax.Array, teacher_logits: jax.Array,
                       label: jax.Array, T: float = 1.0,
                       ignore: int = IGNORE) -> jax.Array:
    """Masked KL distillation (reference ``KLDivergenceLoss``,
    criterion.py:56-67)."""
    c = student_logits.shape[-1]
    logp = jax.nn.log_softmax(student_logits.reshape(-1, c) / T, axis=-1)
    q = jax.nn.softmax(teacher_logits.reshape(-1, c) / T, axis=-1)
    valid = (label.reshape(-1) != ignore).astype(logp.dtype)
    kl = jnp.sum(q * (jnp.log(jnp.clip(q, 1e-12, None)) - logp), axis=-1)
    return T * T * jnp.sum(kl * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def _resize_logits(logits: jax.Array, hw: Tuple[int, int]) -> jax.Array:
    b, _, _, c = logits.shape
    return jax.image.resize(logits, (b, hw[0], hw[1], c), method="bilinear")


def criterion_all(preds_parsing: Sequence[jax.Array],
                  preds_edge: Sequence[jax.Array],
                  target_parsing: jax.Array, target_edge: jax.Array,
                  lambda_1: float = 1.0, lambda_2: float = 1.0,
                  lambda_3: float = 0.1, ignore: int = IGNORE) -> jax.Array:
    """Reference ``CriterionAll.parsing_loss`` (criterion.py:85-134):
    Σ over parsing heads of ½λ₁(Lovasz + CE) at full res, + λ₂ weighted edge
    CE, + λ₃ consistency.  All logits NHWC; targets (B, H, W)."""
    h, w = target_parsing.shape[1:3]

    # class-balanced edge weights (criterion.py:101-105):
    # weight(class 0, non-edge) = pos/(p+n); weight(class 1, edge) = neg/(p+n)
    pos = jnp.sum(target_edge == 1).astype(jnp.float32)
    neg = jnp.sum(target_edge == 0).astype(jnp.float32)
    tot = jnp.maximum(pos + neg, 1.0)
    edge_weights = jnp.stack([pos / tot, neg / tot])

    loss = 0.0
    scaled_parsing = [_resize_logits(pp, (h, w)) for pp in preds_parsing]
    scaled_edge = [_resize_logits(pe, (h, w)) for pe in preds_edge]
    for sp in scaled_parsing:
        loss += 0.5 * lambda_1 * (
            lovasz_softmax(jax.nn.softmax(sp, axis=-1), target_parsing,
                           ignore=ignore)
            + masked_cross_entropy(sp, target_parsing, ignore=ignore))
    for se in scaled_edge:
        loss += lambda_2 * masked_cross_entropy(se, target_edge, ignore=ignore,
                                                class_weights=edge_weights)
    for sp in scaled_parsing:
        r = consistency_loss(sp, scaled_edge[0], target_parsing,
                             ignore=ignore)
        loss += lambda_3 * jnp.where(jnp.isnan(r), 0.0, r)
    return loss


def contrastive_loss(feats: jax.Array, t: float = 0.07) -> jax.Array:
    """Part-wise InfoNCE (reference ``contrastive_loss``,
    criterion.py:214-237): feats (B, K, C) of per-part descriptors; positives
    are same-part across the batch (hardest positive = min similarity),
    negatives are different parts."""
    b, k, c = feats.shape
    f = feats / (jnp.linalg.norm(feats, axis=2, keepdims=True) + 1e-12)
    scores = jnp.einsum("aid,bjd->abij", f, f)
    scores = scores.transpose(0, 2, 1, 3).reshape(b * k, b * k)  # (a i) (b j)

    eye_k = jnp.eye(k, dtype=bool)
    pos_mask = jnp.tile(eye_k, (b, b))
    pos_mask = pos_mask & ~jnp.eye(b * k, dtype=bool)  # drop self
    neg_mask = jnp.tile(~eye_k, (b, b))

    # hardest positive: min over positives (reference l_pos.min(dim=1))
    l_pos = jnp.min(jnp.where(pos_mask, scores, jnp.inf), axis=1)
    # negatives: all same count per row = k*(b... ) — masked logits at -inf
    neg_logits = jnp.where(neg_mask, scores, -jnp.inf)
    logits = jnp.concatenate([l_pos[:, None], neg_logits], axis=1) / t
    return jnp.mean(-jax.nn.log_softmax(logits, axis=1)[:, 0])


def sup_con_loss(features: jax.Array, labels: Optional[jax.Array] = None,
                 mask: Optional[jax.Array] = None, temperature: float = 0.7,
                 base_temperature: float = 0.7) -> jax.Array:
    """Supervised contrastive loss (Khosla; reference ``SupConLoss``,
    sup_con_loss.py:11-100, contrast_mode='all')."""
    assert features.ndim == 3, "features must be (bsz, n_views, dim)"
    bsz, n_views, dim = features.shape
    if labels is not None:
        mask = (labels[:, None] == labels[None, :]).astype(jnp.float32)
    elif mask is None:
        mask = jnp.eye(bsz, dtype=jnp.float32)

    contrast = features.transpose(1, 0, 2).reshape(n_views * bsz, dim)
    anchor = contrast  # contrast_mode='all'
    n = n_views * bsz

    logits = anchor @ contrast.T / temperature
    logits = logits - jax.lax.stop_gradient(jnp.max(logits, axis=1, keepdims=True))
    mask_full = jnp.tile(mask, (n_views, n_views))
    logits_mask = 1.0 - jnp.eye(n)
    mask_full = mask_full * logits_mask

    exp_logits = jnp.exp(logits) * logits_mask
    log_prob = logits - jnp.log(jnp.sum(exp_logits, axis=1, keepdims=True) + 1e-12)
    denom = jnp.maximum(jnp.sum(mask_full, axis=1), 1e-12)
    mean_log_prob_pos = jnp.sum(mask_full * log_prob, axis=1) / denom
    loss = -(temperature / base_temperature) * mean_log_prob_pos
    return jnp.mean(loss)
