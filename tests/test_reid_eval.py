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


def test_eval_sysu_matches_per_query_reference(rng):
    """The vectorized eval_sysu (closed-form dedup CMC, no per-query Python
    loop) must reproduce a literal per-query transcription of the reference
    algorithm (reid_tools.py:162-235) on random data, including queries
    whose identity is absent from the gallery."""
    from vqvae2_tpu.eval.reid import eval_sysu

    num_q, num_g, max_rank = 40, 120, 20
    q_pids = rng.integers(0, 12, size=num_q)       # some ids absent (>=10)
    g_pids = rng.integers(0, 10, size=num_g)
    distmat = rng.normal(size=(num_q, num_g))

    indices = np.argsort(distmat, axis=1)
    pred_label = g_pids[indices]
    matches = (pred_label == q_pids[:, None]).astype(np.int32)
    id_all_cmc, all_ap, all_inp, num_valid_q = [], [], [], 0
    for qi in range(num_q):
        ranked_ids = pred_label[qi]
        first_idx = np.sort(np.unique(ranked_ids, return_index=True)[1])
        id_ranked = ranked_ids[first_idx]
        id_cmc = (id_ranked == q_pids[qi]).astype(np.int32).cumsum()
        id_all_cmc.append(np.pad(id_cmc[:max_rank],
                                 (0, max(0, max_rank - len(id_cmc))),
                                 mode="edge"))
        orig = matches[qi]
        if not orig.any():
            continue
        num_valid_q += 1
        cum = orig.cumsum()
        pos_max = np.max(np.nonzero(orig)[0])
        all_inp.append(cum[pos_max] / (pos_max + 1.0))
        prec = cum / (np.arange(num_g) + 1.0)
        all_ap.append(float((prec * orig).sum() / orig.sum()))
    ref_cmc = np.stack(id_all_cmc).astype(np.float32).sum(0) / num_valid_q

    cmc, mAP, mINP = eval_sysu(distmat, q_pids, g_pids, max_rank=max_rank)
    np.testing.assert_allclose(cmc, ref_cmc, atol=1e-6)
    np.testing.assert_allclose(mAP, np.mean(all_ap), atol=1e-9)
    np.testing.assert_allclose(mINP, np.mean(all_inp), atol=1e-9)


@pytest.mark.slow
def test_retrieval_eval_scales(rng):
    """Host-time guard for SYSU-scale galleries: the vectorized eval_sysu
    must stay in seconds (the per-query-loop version was minutes per
    validate call at ~4k queries x 10 trials)."""
    import time

    from vqvae2_tpu.eval.reid import eval_sysu, rerank_dist

    q_pids = rng.integers(0, 300, size=2000)
    g_pids = rng.integers(0, 300, size=4000)
    distmat = rng.normal(size=(2000, 4000)).astype(np.float32)
    t0 = time.perf_counter()
    cmc, mAP, mINP = eval_sysu(distmat, q_pids, g_pids)
    dt = time.perf_counter() - t0
    assert 0 <= mAP <= 1
    # generous bound: this 1-CPU image runs contended; the guard exists to
    # catch the minutes-level per-query loop, not to microbenchmark
    assert dt < 60.0, f"eval_sysu took {dt:.1f}s at 2000x4000"

    feat = rng.normal(size=(600, 64)).astype(np.float32)
    feat /= np.linalg.norm(feat, axis=1, keepdims=True)
    t0 = time.perf_counter()
    d = rerank_dist(feat[:200], feat[200:])
    dt = time.perf_counter() - t0
    assert d.shape == (200, 400)
    assert dt < 60.0, f"rerank_dist took {dt:.1f}s at n=600"
