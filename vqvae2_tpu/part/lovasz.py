"""Lovasz-Softmax loss (Berman 2018) — jit-safe TPU rebuild of reference
``part/lovasz_softmax.py``.

The reference filters ignore-pixels with boolean indexing and Python loops
over classes (``lovasz_softmax_flat``, lovasz_softmax.py:183-211) — both
unjittable.  Here validity is a weight vector: ignored pixels get error −1 so
they sort to the tail, and the masked cumulative sums in the Lovasz gradient
give them exactly zero weight.  Classes are vectorized with ``vmap``; the
'present' rule (skip classes absent from the labels) becomes a masked mean.

TPU sort strategy (round-5 roofline fix: one full-res lovasz call measured
656 ms of the 2,150 ms ReID step at ~0% MXU): ``argsort`` + post-hoc fancy
indexing costs one variadic sort (key + iota) **plus three 3M-element random
gathers per class** — and random gathers are the slowest memory pattern on
TPU.  Instead ``lax.sort`` co-sorts the foreground flags with the error keys
in a single bitonic network (descending via negated keys), and validity is
reconstructed from the key itself: valid errors live in [0, 1] (softmax) so
the −1 sentinel marks ignored pixels after sorting — no gather anywhere.
The computation is mathematically identical; only the schedule changed.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax


def _lovasz_grad_sorted(fg_sorted: jax.Array, valid_sorted: jax.Array) -> jax.Array:
    """Gradient of the Lovasz extension w.r.t. sorted errors (reference
    ``lovasz_grad``, lovasz_softmax.py:29-41), with invalid entries masked out
    of the cumulative intersection/union."""
    fg = fg_sorted * valid_sorted
    gts = jnp.sum(fg)
    intersection = gts - jnp.cumsum(fg)
    union = gts + jnp.cumsum((1.0 - fg_sorted) * valid_sorted)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
    jaccard = jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])
    return jaccard * valid_sorted


def _cosort_desc(errors: jax.Array, payload: jax.Array):
    """Descending co-sort: one variadic bitonic sort, no gathers.

    ``jnp.argsort`` + ``x[order]`` lowers to the same variadic sort PLUS a
    random gather per indexed array — the gathers, not the sort, dominated
    the round-4 roofline.  ``lax.sort`` carries the payload through the
    comparison network directly.
    """
    neg_sorted, payload_sorted = lax.sort((-errors, payload), num_keys=1)
    return -neg_sorted, payload_sorted


def lovasz_softmax(probas: jax.Array, labels: jax.Array,
                   ignore: int = 255,
                   class_weights: Optional[jax.Array] = None) -> jax.Array:
    """Multi-class Lovasz-Softmax.

    Args:
      probas: (B, H, W, C) class probabilities (NHWC — reference is NCHW).
      labels: (B, H, W) int labels in [0, C) or ``ignore``.
      class_weights: optional (C,) per-class weights (reference ``weighted``).

    'present'-class averaging as in the reference: classes with no foreground
    among valid pixels contribute nothing.
    """
    c = probas.shape[-1]
    p = probas.reshape(-1, c)
    lab = labels.reshape(-1)
    valid = (lab != ignore)
    lab_safe = jnp.where(valid, lab, 0)

    def per_class(ci):
        fg = (lab_safe == ci) & valid
        fgf = fg.astype(p.dtype)
        errors = jnp.abs(fgf - p[:, ci])
        # push ignored pixels to the sort tail; valid errors are in [0, 1]
        # (probabilities), so validity survives the sort inside the key
        errors = jnp.where(valid, errors, -1.0)
        errors_sorted, fg_sorted = _cosort_desc(errors, fgf)
        valid_sorted = (errors_sorted >= 0.0).astype(p.dtype)
        grad = _lovasz_grad_sorted(fg_sorted, valid_sorted)
        loss_c = jnp.dot(jnp.maximum(errors_sorted, 0.0), grad)
        present = jnp.sum(fgf) > 0
        return loss_c, present

    losses, present = jax.vmap(per_class)(jnp.arange(c))
    if class_weights is not None:
        losses = losses * class_weights
    denom = jnp.maximum(jnp.sum(present.astype(p.dtype)), 1.0)
    return jnp.sum(jnp.where(present, losses, 0.0)) / denom


def lovasz_hinge(logits: jax.Array, labels: jax.Array,
                 ignore: int = 255) -> jax.Array:
    """Binary Lovasz hinge (reference ``lovasz_hinge_flat``,
    lovasz_softmax.py:106-124), whole-batch flavor."""
    lg = logits.reshape(-1)
    lab = labels.reshape(-1)
    valid = (lab != ignore)
    labf = jnp.where(valid, lab, 0).astype(lg.dtype)
    signs = 2.0 * labf - 1.0
    errors = 1.0 - lg * signs
    # −inf sentinel sorts ignored pixels to the tail; hinge errors of valid
    # pixels are finite, so validity is recoverable from the sorted key
    errors = jnp.where(valid, errors, -jnp.inf)
    errors_sorted, lab_sorted = _cosort_desc(errors, labf)
    valid_sorted = jnp.isfinite(errors_sorted).astype(lg.dtype)
    grad = _lovasz_grad_sorted(lab_sorted, valid_sorted)
    return jnp.dot(jax.nn.relu(jnp.where(valid_sorted > 0, errors_sorted,
                                         0.0)), grad)
