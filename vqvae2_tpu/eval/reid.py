"""ReID retrieval evaluation — TPU/numpy rebuild of reference ``reid_tools.py``.

Feature extraction is a jitted device loop; the retrieval metrics stay in
numpy on host (data-dependent per-query loops, SURVEY.md §7 "hard parts":
keep eval in numpy, jit only feature extraction).

Implements the SYSU-MM01 protocol exactly as the reference does
(``eval_sysu``, reid_tools.py:162-235): the reported CMC is the
*identity-deduplicated* curve (first occurrence of each gallery identity in
ranked order), mAP is standard average precision over the raw ranking, and
mINP follows Ye et al.'s survey definition.  ``rerank_dist`` is the
k-reciprocal re-ranking of ``calc_dist`` (reid_tools.py:238-305).
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional, Tuple

import numpy as np


def eval_sysu(distmat: np.ndarray, q_pids: np.ndarray, g_pids: np.ndarray,
              q_camids: Optional[np.ndarray] = None,
              g_camids: Optional[np.ndarray] = None,
              max_rank: int = 20) -> Tuple[np.ndarray, float, float]:
    """SYSU-MM01 metric (reference reid_tools.py:162-235).

    ``distmat``: (num_q, num_g), smaller = more similar.
    Returns ``(id_cmc[:max_rank], mAP, mINP)``.
    """
    distmat = np.asarray(distmat)
    q_pids, g_pids = np.asarray(q_pids), np.asarray(g_pids)
    num_q, num_g = distmat.shape
    max_rank = min(max_rank, num_g)

    indices = np.argsort(distmat, axis=1)
    pred_label = g_pids[indices]
    matches = (pred_label == q_pids[:, None]).astype(np.int32)

    id_all_cmc, all_ap, all_inp = [], [], []
    num_valid_q = 0
    for qi in range(num_q):
        # identity-deduplicated CMC: keep first occurrence of each gallery id
        # in ranked order (reid_tools.py:193-198)
        ranked_ids = pred_label[qi]
        first_idx = np.sort(np.unique(ranked_ids, return_index=True)[1])
        id_ranked = ranked_ids[first_idx]
        id_cmc = (id_ranked == q_pids[qi]).astype(np.int32).cumsum()
        id_all_cmc.append(id_cmc[:max_rank])

        orig = matches[qi]
        if not orig.any():
            continue  # query id absent from gallery
        num_valid_q += 1

        cum = orig.cumsum()
        pos_max = np.max(np.nonzero(orig)[0])
        all_inp.append(cum[pos_max] / (pos_max + 1.0))

        prec_at_hits = cum / (np.arange(num_g) + 1.0)
        all_ap.append(float((prec_at_hits * orig).sum() / orig.sum()))

    assert num_valid_q > 0, "no query identity appears in the gallery"
    # pad id-cmc rows shorter than max_rank (few unique gallery ids)
    id_all_cmc = np.stack([
        np.pad(r, (0, max_rank - len(r)), mode="edge") if len(r) < max_rank else r
        for r in id_all_cmc
    ]).astype(np.float32)
    id_cmc = id_all_cmc.sum(0) / num_valid_q
    return id_cmc, float(np.mean(all_ap)), float(np.mean(all_inp))


def rerank_dist(prob_feat: np.ndarray, gal_feat: np.ndarray,
                k1: int = 20, k2: int = 6, lambda_value: float = 0.3
                ) -> np.ndarray:
    """k-reciprocal re-ranking (Zhong et al. CVPR'17; reference ``calc_dist``,
    reid_tools.py:238-305 with the same k1/k2/λ defaults).  float32 throughout
    (the reference's fp16 is a GPU-memory concession)."""
    q = prob_feat.shape[0]
    feat = np.concatenate([prob_feat, gal_feat], axis=0).astype(np.float32)
    n = feat.shape[0]

    sq = (feat ** 2).sum(1)
    original = sq[:, None] + sq[None, :] - 2.0 * feat @ feat.T
    np.clip(original, 0, None, out=original)
    original = (original / original.max(axis=0)).T
    rank = np.argsort(original, axis=1).astype(np.int32)

    def k_reciprocal(i: int, k: int) -> np.ndarray:
        fwd = rank[i, : k + 1]
        back = rank[fwd, : k + 1]
        return fwd[np.where(back == i)[0]]

    V = np.zeros_like(original)
    half_k1 = int(np.around(k1 / 2))
    for i in range(n):
        expansion = k_recip = k_reciprocal(i, k1)
        for cand in k_recip:
            cand_recip = k_reciprocal(int(cand), half_k1)
            if len(np.intersect1d(cand_recip, k_recip)) > (2.0 / 3.0) * len(cand_recip):
                expansion = np.append(expansion, cand_recip)
        expansion = np.unique(expansion)
        w = np.exp(-original[i, expansion])
        V[i, expansion] = w / w.sum()

    if k2 != 1:
        V = np.stack([V[rank[i, :k2]].mean(axis=0) for i in range(n)])

    original_q = original[:q]
    inv_index = [np.where(V[:, j] != 0)[0] for j in range(n)]
    jaccard = np.zeros_like(original_q)
    for i in range(q):
        temp_min = np.zeros(n, dtype=np.float32)
        nz = np.where(V[i] != 0)[0]
        for j in nz:
            rows = inv_index[j]
            temp_min[rows] += np.minimum(V[i, j], V[rows, j])
        jaccard[i] = 1.0 - temp_min / (2.0 - temp_min)

    final = jaccard * (1 - lambda_value) + original_q * lambda_value
    return final[:, q:]


def cosine_distmat(query_feat: np.ndarray, gall_feat: np.ndarray) -> np.ndarray:
    """-cosine similarity as a distance (reference test(), reid_tools.py:73-78:
    eval_sysu receives ``-q@gᵀ``)."""
    return -np.matmul(query_feat, gall_feat.T)


def extract_features(apply_fn: Callable, batches: Iterable, feat_dim: int,
                     modal: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batched eval-mode feature extraction (reference ``ext_feat``,
    reid_tools.py:43-64): uses the L2-normalized attention feature (the
    second output of the eval forward)."""
    feats, labels, cams = [], [], []
    for imgs, lab, cam in batches:
        _, feat_att = apply_fn(imgs, modal)
        feats.append(np.asarray(feat_att)[:, :feat_dim])
        labels.append(np.asarray(lab))
        cams.append(np.asarray(cam))
    return (np.concatenate(feats), np.concatenate(labels),
            np.concatenate(cams))


def test_retrieval(query_feat, q_l, q_cam, gall_feat, g_l, g_cam,
                   rerank: bool = False):
    """Reference ``test`` (reid_tools.py:67-80): cosine retrieval (or
    re-ranked L2) → SYSU metric."""
    if rerank:
        distmat = rerank_dist(query_feat, gall_feat)
    else:
        distmat = cosine_distmat(query_feat, gall_feat)
    return eval_sysu(distmat, q_l, g_l, q_cam, g_cam)


def validate(model, variables, data_path: str, mode: str = "all",
             test_batch: int = 50, img_size=(144, 288),
             trials: int = 1, seed: int = 0) -> float:
    """End-to-end SYSU validation (reference ``validate``/``testAll``,
    reid_tools.py:82-159): build query/gallery per protocol, extract features
    with the jitted eval forward, run cosine retrieval, average over
    ``trials`` gallery resamplings.  Returns mAP (and prints the CMC line)."""
    import jax
    import jax.numpy as jnp

    from vqvae2_tpu.data.sysu import TestData, process_sysu

    test_mode = {"Vis": (1, 1), "Ir": (2, 2)}.get(mode, (1, 2))
    rng = np.random.default_rng(seed)

    @jax.jit
    def fwd_rgb(imgs):
        return model.apply(variables, xRGB=imgs, modal=1)[1]

    @jax.jit
    def fwd_ir(imgs):
        return model.apply(variables, xIR=imgs, modal=2)[1]

    def extract(files, labels, cams, modal):
        td = TestData(files, labels, cams, img_size=img_size)
        fwd = fwd_rgb if modal == 1 else fwd_ir
        feats = []
        for imgs, lab, cam in td.batches(test_batch):
            feats.append(np.asarray(fwd(jnp.asarray(imgs))))
        return np.concatenate(feats), td.test_label, td.test_cam - 1

    qf, ql, qc = extract(*process_sysu(data_path, data="query", mode=mode,
                                       rng=rng), test_mode[1])
    cmc_sum, map_sum, minp_sum = None, 0.0, 0.0
    for _ in range(trials):
        gf, gl, gc = extract(*process_sysu(data_path, data="gallery",
                                           mode=mode, single_shot=True,
                                           rng=rng), test_mode[0])
        cmc, mAP, mINP = test_retrieval(qf, ql, qc, gf, gl, gc)
        cmc_sum = cmc if cmc_sum is None else cmc_sum + cmc
        map_sum += mAP
        minp_sum += mINP
    cmc = cmc_sum / trials
    mAP, mINP = map_sum / trials, minp_sum / trials
    r = lambda k: cmc[min(k, len(cmc) - 1)]  # small galleries: clamp rank
    print(f"FC:   Rank-1: {r(0):.2%} | Rank-5: {r(4):.2%} | "
          f"Rank-10: {r(9):.2%}| Rank-20: {r(19):.2%}| "
          f"mAP: {mAP:.2%}| mINP: {mINP:.2%}", flush=True)
    return mAP
