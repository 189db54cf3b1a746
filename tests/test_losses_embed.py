"""Losses tested against torch-computed ground truth (torch-cpu is baked into
the image, giving an independent implementation of margin-ranking/soft-margin
semantics), plus EmbedNet shape/routing tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae2_tpu import losses


@pytest.fixture
def feats_labels(rng):
    # P=4 identities x K=4 instances
    labels = np.repeat(np.arange(4), 4)
    feats = rng.normal(size=(16, 32)).astype(np.float32)
    feats += labels[:, None] * 0.5  # make identities separable-ish
    return feats, labels.astype(np.int32)


def torch_batch_hard(feats, labels, margin=0.3):
    import torch

    t = torch.from_numpy(feats)
    lab = torch.from_numpy(labels)
    n = t.shape[0]
    dist = torch.cdist(t, t).clamp(min=1e-6)
    mask = lab.unsqueeze(0) == lab.unsqueeze(1)
    ap = torch.stack([dist[i][mask[i]].max() for i in range(n)])
    an = torch.stack([dist[i][~mask[i]].min() for i in range(n)])
    loss = torch.nn.MarginRankingLoss(margin=margin)(an, ap, torch.ones_like(an))
    return float(loss), int((an >= ap).sum())


def test_triplet_loss_vs_torch(feats_labels):
    feats, labels = feats_labels
    loss, correct = jax.jit(losses.triplet_loss)(jnp.asarray(feats),
                                                 jnp.asarray(labels))
    ref_loss, ref_correct = torch_batch_hard(feats, labels)
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-4)
    assert int(correct) == ref_correct


def test_triplet_wrt_vs_torch(feats_labels):
    import torch

    feats, labels = feats_labels
    loss, correct = jax.jit(losses.triplet_loss_wrt)(jnp.asarray(feats),
                                                     jnp.asarray(labels))

    t = torch.from_numpy(feats)
    lab = torch.from_numpy(labels)
    n = t.shape[0]
    dist = torch.cdist(t, t)
    is_pos = (lab.unsqueeze(0) == lab.unsqueeze(1)).float()
    is_neg = 1 - is_pos
    d_ap, d_an = dist * is_pos, dist * is_neg

    def w(d, m):
        mx = (d * m).max(dim=1, keepdim=True)[0]
        e = torch.exp(d - mx) * m
        return e / (e.sum(dim=1, keepdim=True) + 1e-6)

    fp = (d_ap * w(d_ap, is_pos)).mean(1)
    cn = (d_an * w(-d_an, is_neg)).mean(1)
    ref = torch.nn.SoftMarginLoss()(cn - fp, torch.ones_like(fp))
    np.testing.assert_allclose(float(loss), float(ref), rtol=1e-3)


def test_cross_triplet(rng):
    labels = np.repeat(np.arange(4), 2).astype(np.int32)
    a = rng.normal(size=(8, 16)).astype(np.float32)
    p = rng.normal(size=(8, 16)).astype(np.float32)
    n = rng.normal(size=(8, 16)).astype(np.float32)
    loss = jax.jit(losses.cross_triplet_loss)(
        jnp.asarray(a), jnp.asarray(p), jnp.asarray(n),
        jnp.asarray(labels), jnp.asarray(labels), jnp.asarray(labels))
    assert np.isfinite(float(loss)) and float(loss) >= 0

    # identical embeddings + margin -> loss == margin
    z = jnp.zeros((4, 8))
    lab = jnp.asarray([0, 0, 1, 1])
    l2 = losses.cross_triplet_loss(z, z, z, lab, lab, lab, margin=0.3)
    np.testing.assert_allclose(float(l2), 0.3, atol=1e-6)


def test_pdist_matches_torch(rng):
    import torch

    a = rng.normal(size=(5, 7)).astype(np.float32)
    b = rng.normal(size=(9, 7)).astype(np.float32)
    d = losses.pdist(jnp.asarray(a), jnp.asarray(b))
    ref = torch.cdist(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(np.asarray(d), ref, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# EmbedNet
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_embed():
    from vqvae2_tpu.models.embed_net import EmbedNet

    model = EmbedNet(class_num=10, arch="resnet18")
    rgb = jnp.zeros((2, 96, 48, 3), jnp.float32)
    ir = jnp.zeros((2, 96, 48, 3), jnp.float32)
    # with_feature=True reaches every submodule (incl. classifier) at init
    variables = model.init(jax.random.PRNGKey(0), xRGB=rgb, xIR=ir, modal=0,
                           with_feature=True)
    return model, variables


def test_embed_net_modal_routing(tiny_embed, rng):
    model, variables = tiny_embed
    rgb = jnp.asarray(rng.normal(size=(2, 96, 48, 3)), jnp.float32)
    ir = jnp.asarray(rng.normal(size=(2, 96, 48, 3)), jnp.float32)

    # modal=0: concat RGB+IR along batch
    feat_pool, logits = model.apply(variables, xRGB=rgb, xIR=ir, modal=0,
                                    train=True, mutable=["batch_stats"])[0]
    assert feat_pool.shape == (4, 512) and logits.shape == (4, 10)

    # eval: L2-normalized features
    feat, featp = model.apply(variables, xRGB=rgb, modal=1)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(feat, axis=1)), 1.0,
                               rtol=1e-4)

    # with_feature returns the 5-tuple
    out = model.apply(variables, xRGB=rgb, modal=1, with_feature=True)
    feat_pool, logits, x4, mask, x3 = out
    assert x4.shape[-1] == 512 and x3.shape[-1] == 256
    assert mask.shape == x4.shape[:3] + (1,)
    assert float(mask.min()) >= 0 and float(mask.max()) <= 1

    # last-stride-1: x4 spatial == x3 spatial (96/16=6, 48/16=3)
    assert x4.shape[1:3] == x3.shape[1:3] == (6, 3)


def test_embed_net_modalities_differ(tiny_embed, rng):
    model, variables = tiny_embed
    x = jnp.asarray(rng.normal(size=(2, 96, 48, 3)), jnp.float32)
    f1, _ = model.apply(variables, xRGB=x, modal=1)
    f2, _ = model.apply(variables, xIR=x, modal=2)
    f3, _ = model.apply(variables, xZ=x, modal=3)
    # separate stems -> different features for the same input
    assert not np.allclose(np.asarray(f1), np.asarray(f2))
    assert not np.allclose(np.asarray(f1), np.asarray(f3))


def test_embed_net_part_head(rng):
    from vqvae2_tpu.models.embed_net import EmbedNet

    model = EmbedNet(class_num=10, arch="resnet18", part=True)
    rgb = jnp.asarray(rng.normal(size=(2, 96, 48, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), xRGB=rgb, modal=1, train=True)
    (feats, logits, feat_all), _ = model.apply(
        variables, xRGB=rgb, modal=1, train=True, mutable=["batch_stats"])
    assert len(feats) == 6 and len(logits) == 6
    assert feats[0].shape == (2, 512) and logits[0].shape == (2, 10)
    assert feat_all.shape == (2, 6 * 512)


def test_embed_net_nonlocal_variant(rng):
    """old_model.py embed_net2 capability: NL-interleaved trunk."""
    from vqvae2_tpu.models.embed_net import EmbedNet

    model = EmbedNet(class_num=5, arch="resnet18", no_local="on")
    rgb = jnp.asarray(rng.normal(size=(2, 96, 48, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), xRGB=rgb, modal=1,
                           with_feature=True)
    assert any(k.startswith("NL") for k in variables["params"]["nl_trunk"])
    feat_pool, logits, x4, mask, x3 = model.apply(
        variables, xRGB=rgb, modal=1, with_feature=True)
    assert feat_pool.shape == (2, 512) and logits.shape == (2, 5)
