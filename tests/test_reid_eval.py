"""ReID metric tests: hand-constructed rankings with known CMC/mAP/mINP, and
re-ranking sanity (perfect clusters stay perfectly ranked)."""

import numpy as np
import pytest

from vqvae2_tpu.eval.reid import (
    cosine_distmat,
    eval_sysu,
    rerank_dist,
)
from vqvae2_tpu.eval.reid import test_retrieval as retrieval_eval


def test_eval_sysu_perfect_ranking():
    # 2 queries, 4 gallery: correct ids ranked first
    g_pids = np.array([0, 1, 0, 1])
    q_pids = np.array([0, 1])
    dist = np.array([
        [0.0, 0.9, 0.1, 0.8],   # q0: g0(id0), g2(id0) closest
        [0.9, 0.0, 0.8, 0.1],
    ])
    cmc, mAP, mINP = eval_sysu(dist, q_pids, g_pids, max_rank=2)
    assert cmc[0] == 1.0 and cmc[1] == 1.0
    assert mAP == 1.0 and mINP == 1.0


def test_eval_sysu_known_ap():
    # one query, 4 gallery with ids [1,0,0,1], query id 0:
    # ranked matches = [0,1,1,0]; AP = (1/2 + 2/3)/2 = 7/12
    g_pids = np.array([1, 0, 0, 1])
    q_pids = np.array([0])
    dist = np.array([[0.0, 0.1, 0.2, 0.3]])
    cmc, mAP, mINP = eval_sysu(dist, q_pids, g_pids, max_rank=4)
    np.testing.assert_allclose(mAP, 7.0 / 12.0, rtol=1e-6)
    # id-dedup CMC: ranked ids [1,0,...] dedup -> [1,0]; match at rank 2
    assert cmc[0] == 0.0 and cmc[1] == 1.0
    # mINP: last match at position 3 (index 2), cum[2]=2 -> 2/3
    np.testing.assert_allclose(mINP, 2.0 / 3.0, rtol=1e-6)


def test_eval_sysu_skips_absent_ids():
    g_pids = np.array([5, 5, 6])
    q_pids = np.array([5, 99])  # 99 not in gallery
    dist = np.random.default_rng(0).random((2, 3))
    cmc, mAP, mINP = eval_sysu(dist, q_pids, g_pids, max_rank=3)
    assert np.isfinite(mAP) and np.isfinite(mINP)


def test_rerank_preserves_clear_clusters(rng):
    # 3 identities, well-separated clusters; re-ranked retrieval stays perfect
    centers = rng.normal(size=(3, 32)) * 10
    q_feat = np.stack([centers[i] + rng.normal(size=32) * 0.01 for i in range(3)])
    g_feat = np.concatenate([
        centers[i] + rng.normal(size=(4, 32)) * 0.01 for i in range(3)
    ]).astype(np.float32)
    g_pids = np.repeat(np.arange(3), 4)
    q_pids = np.arange(3)

    dist = rerank_dist(q_feat.astype(np.float32), g_feat)
    assert dist.shape == (3, 12)
    cmc, mAP, mINP = eval_sysu(dist, q_pids, g_pids)
    assert mAP > 0.99 and cmc[0] == 1.0


def test_test_retrieval_cosine(rng):
    centers = rng.normal(size=(4, 16)) * 5
    q = (centers + rng.normal(size=(4, 16)) * 0.01).astype(np.float32)
    g = np.concatenate([centers + rng.normal(size=(4, 16)) * 0.01
                        for _ in range(2)]).astype(np.float32)
    # L2-normalize (cosine retrieval expects normalized feats)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    g_pids = np.tile(np.arange(4), 2)
    cmc, mAP, mINP = retrieval_eval(q, np.arange(4), None, g, g_pids, None)
    assert cmc[0] == 1.0 and mAP > 0.99


@pytest.mark.slow
def test_validate_end_to_end(tmp_path, rng):
    """Full SYSU validation protocol through a real (tiny) EmbedNet."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from vqvae2_tpu.eval.reid import validate
    from vqvae2_tpu.models.embed_net import EmbedNet

    root = tmp_path / "SYSU-MM01"
    (root / "exp").mkdir(parents=True)
    ids = [1, 2, 3]
    with open(root / "exp" / "test_id.txt", "w") as f:
        f.write(",".join(map(str, ids)) + "\n")
    for cam in [f"cam{i}" for i in range(1, 7)]:
        for pid in ids:
            d = root / cam / ("%04d" % pid)
            d.mkdir(parents=True)
            for k in range(2):
                arr = rng.integers(0, 255, size=(64, 32, 3)).astype(np.uint8)
                Image.fromarray(arr).save(d / f"{k:04d}.jpg")

    model = EmbedNet(class_num=3, arch="resnet18")
    probe = jnp.zeros((1, 72, 36, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), xRGB=probe, modal=1,
                           with_feature=True)
    mAP = validate(model, variables, str(root), mode="all",
                   img_size=(36, 72), test_batch=8)
    assert 0.0 <= mAP <= 1.0
