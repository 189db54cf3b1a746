"""Parsing-loss tests: Lovasz vs the reference algorithm hand-rolled in numpy,
edge generation vs torch-free reimplementation, masked CE vs torch CE with
ignore_index, SupCon vs direct computation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae2_tpu.part import criterion as C
from vqvae2_tpu.part.lovasz import lovasz_softmax


def numpy_lovasz_softmax(probas, labels, ignore=255):
    """Direct numpy port of the reference algorithm (boolean filtering +
    per-class loop) as ground truth."""
    c = probas.shape[-1]
    p = probas.reshape(-1, c)
    lab = labels.reshape(-1)
    valid = lab != ignore
    p, lab = p[valid], lab[valid]
    losses = []
    for ci in range(c):
        fg = (lab == ci).astype(np.float64)
        if fg.sum() == 0:
            continue
        errors = np.abs(fg - p[:, ci])
        order = np.argsort(-errors, kind="stable")
        e_sorted, fg_sorted = errors[order], fg[order]
        gts = fg_sorted.sum()
        inter = gts - fg_sorted.cumsum()
        union = gts + (1 - fg_sorted).cumsum()
        jac = 1.0 - inter / union
        jac[1:] = jac[1:] - jac[:-1]
        losses.append((e_sorted * jac).sum())
    return np.mean(losses)


def test_lovasz_softmax_matches_reference_algorithm(rng):
    labels = rng.integers(0, 4, size=(2, 8, 8))
    labels[0, :2] = 255  # ignore region
    logits = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    probas = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    got = float(lovasz_softmax(jnp.asarray(probas), jnp.asarray(labels)))
    want = numpy_lovasz_softmax(probas.astype(np.float64), labels)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_masked_ce_vs_torch(rng):
    import torch

    logits = rng.normal(size=(2, 6, 6, 5)).astype(np.float32)
    labels = rng.integers(0, 5, size=(2, 6, 6))
    labels[1, 3:] = 255
    got = float(C.masked_cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    ref = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(labels).long(), ignore_index=255)
    np.testing.assert_allclose(got, float(ref), rtol=1e-5)

    # weighted
    w = rng.random(5).astype(np.float32)
    got_w = float(C.masked_cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                         class_weights=jnp.asarray(w)))
    ref_w = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(labels).long(), weight=torch.from_numpy(w),
        ignore_index=255)
    np.testing.assert_allclose(got_w, float(ref_w), rtol=1e-5)


def test_generate_edge():
    lab = np.zeros((1, 8, 8), np.int32)
    lab[0, :, 4:] = 1  # vertical boundary at col 3|4
    edge = np.asarray(C.generate_edge(jnp.asarray(lab)))
    assert edge.shape == (1, 8, 8)
    # boundary columns (3,4) and their 3-wide dilation are edge
    assert edge[0, 4, 3] == 1 and edge[0, 4, 4] == 1
    assert edge[0, 4, 0] == 0 and edge[0, 4, 7] == 0
    # ignore labels produce no edges
    lab2 = np.full((1, 8, 8), 255, np.int32)
    assert np.asarray(C.generate_edge(jnp.asarray(lab2))).sum() == 0


@pytest.mark.slow
def test_criterion_all_runs(rng):
    parsing = [jnp.asarray(rng.normal(size=(2, 4, 4, 7)), jnp.float32),
               jnp.asarray(rng.normal(size=(2, 8, 8, 7)), jnp.float32)]
    edges = [jnp.asarray(rng.normal(size=(2, 4, 4, 2)), jnp.float32)]
    target = jnp.asarray(rng.integers(0, 7, size=(2, 8, 8)), jnp.int32)
    target_edge = np.asarray(C.generate_edge(target)).astype(np.int32)
    loss = jax.jit(C.criterion_all)(parsing, edges, target,
                                    jnp.asarray(target_edge))
    assert np.isfinite(float(loss)) and float(loss) > 0
    # differentiable
    g = jax.grad(lambda p: C.criterion_all([p], edges, target,
                                           jnp.asarray(target_edge)))(parsing[1])
    assert bool(jnp.all(jnp.isfinite(g)))


def test_sup_con_vs_torch_semantics(rng):
    feats = rng.normal(size=(6, 2, 16)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    labels = np.asarray([0, 0, 1, 1, 2, 2], np.int32)
    got = float(C.sup_con_loss(jnp.asarray(feats), jnp.asarray(labels)))

    # direct dense computation
    n_views, bsz = 2, 6
    cf = np.concatenate([feats[:, 0], feats[:, 1]], axis=0)
    t = 0.7
    logits = cf @ cf.T / t
    logits -= logits.max(axis=1, keepdims=True)
    mask = (labels[:, None] == labels[None, :]).astype(np.float64)
    mask = np.tile(mask, (2, 2)) * (1 - np.eye(12))
    lmask = 1 - np.eye(12)
    exp_l = np.exp(logits) * lmask
    log_prob = logits - np.log(exp_l.sum(1, keepdims=True))
    mlpp = (mask * log_prob).sum(1) / mask.sum(1)
    want = float((-(t / t) * mlpp).mean())
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_contrastive_loss_part_structure(rng):
    feats = rng.normal(size=(3, 4, 8)).astype(np.float32)
    loss = float(C.contrastive_loss(jnp.asarray(feats)))
    assert np.isfinite(loss) and loss > 0
    # identical part descriptors across batch -> positives perfect -> low loss
    one = rng.normal(size=(1, 4, 8)).astype(np.float32)
    same = np.repeat(one, 3, axis=0)
    loss_same = float(C.contrastive_loss(jnp.asarray(same)))
    assert loss_same < loss + 1e-3
