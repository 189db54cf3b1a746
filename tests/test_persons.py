"""Procedural cross-modal person corpus (data/persons.py) — the ReID
convergence-run dataset (scripts/reid_convergence.sh)."""

import numpy as np
import pytest

from vqvae2_tpu.data import persons as P


def test_render_deterministic_and_typed():
    a_img, a_part = P.render_person(3, 5, hw=(96, 48), seed=1)
    b_img, b_part = P.render_person(3, 5, hw=(96, 48), seed=1)
    assert a_img.dtype == np.uint8 and a_part.dtype == np.uint8
    assert a_img.shape == (96, 48, 3) and a_part.shape == (96, 48)
    assert (a_img == b_img).all() and (a_part == b_part).all()
    # a different instance moves nuisance factors only
    c_img, _ = P.render_person(3, 6, hw=(96, 48), seed=1)
    assert (a_img != c_img).any()


def test_identity_attrs_persistent():
    a = P.identity_attrs(4, seed=2)
    b = P.identity_attrs(4, seed=2)
    assert all(np.allclose(a[k], b[k]) for k in a)
    c = P.identity_attrs(5, seed=2)
    assert any(not np.allclose(a[k], c[k]) for k in a)


def test_part_map_structure():
    _, part = P.render_person(0, 0, hw=(288, 144), seed=0)
    present = set(np.unique(part))
    assert {P.BG, P.HEAD, P.TORSO, P.LEGS}.issubset(present)
    # the trainer's parsing-loss gate needs parts covering >15% of pixels
    assert (part != P.BG).mean() > 0.15


def test_ir_modality_drops_color():
    img, _ = P.render_person(1, 2, hw=(96, 48), seed=0, modal="ir")
    # thermal frames are single-channel replicated
    assert (img[..., 0] == img[..., 1]).all() and (img[..., 1] == img[..., 2]).all()
    rgb, _ = P.render_person(1, 2, hw=(96, 48), seed=0, modal="rgb")
    assert (rgb[..., 0] != rgb[..., 1]).any()


def test_blob_layout_loads_through_sysudata(tmp_path):
    from vqvae2_tpu.data.sysu import SYSUData

    root = P.save_person_sysu(str(tmp_path / "d"), n_ids=3, per_id=4,
                              hw=(96, 48))
    ds = SYSUData(root, part=True, seed=0)
    assert ds.num_class == 3
    assert ds.train_color_image.shape == (12, 96, 48, 3)
    assert ds.train_ir_image.shape == (12, 96, 48, 3)
    ds.samplize(batch_size=2, num_pos=2)
    row = ds[0]
    assert row[0].shape[-1] == 3  # augmented rgb
    # rgb cameras are 1/2/4/5, ir cameras 3/6 (SYSU convention)
    assert set(np.unique(ds.train_color_cam)) <= {1, 2, 4, 5}
    assert set(np.unique(ds.train_ir_cam)) <= {3, 6}


def test_eval_tree_loads_through_protocol(tmp_path):
    from vqvae2_tpu.data.sysu import process_sysu

    root = P.save_person_sysu_eval(str(tmp_path / "e"), n_ids=3, per_id=2,
                                   hw=(96, 48))
    qf, qp, qc = process_sysu(root, data="query", mode="all")
    gf, gp, gc = process_sysu(root, data="gallery", mode="all",
                              single_shot=True,
                              rng=np.random.default_rng(0))
    assert len(qf) == 3 * 2 * 2          # ids x IR cams (3,6) x per_id
    assert set(qp) == {1, 2, 3}
    assert len(gf) == 3 * 4              # single-shot: ids x RGB cams
    assert set(gc) <= {1, 2, 4, 5} and set(qc) <= {3, 6}


@pytest.mark.slow
def test_pixel_baseline_is_weak_but_identity_signal_exists():
    """Sanity on the corpus difficulty: raw-pixel cross-modal retrieval must
    be far from perfect (color does not transfer to IR), while SAME-modality
    raw pixels retrieve well (identity geometry is visible) — i.e. the task
    requires learning modality invariance, and there is signal to learn."""
    from vqvae2_tpu.eval.reid import cosine_distmat, eval_sysu

    n_ids, k = 8, 4
    hw = (96, 48)
    rgb = np.stack([P.render_person(p, 200 + i, hw, 0, "rgb")[0].ravel()
                    for p in range(n_ids) for i in range(k)]).astype(np.float32)
    ir = np.stack([P.render_person(p, 300 + i, hw, 0, "ir")[0].ravel()
                   for p in range(n_ids) for i in range(k)]).astype(np.float32)
    rgb2 = np.stack([P.render_person(p, 400 + i, hw, 0, "rgb")[0].ravel()
                     for p in range(n_ids) for i in range(k)]).astype(np.float32)
    pids = np.repeat(np.arange(n_ids), k)
    norm = lambda x: x / np.linalg.norm(x, axis=1, keepdims=True)
    _, cross_map, _ = eval_sysu(cosine_distmat(norm(ir), norm(rgb)),
                                pids, pids)
    _, same_map, _ = eval_sysu(cosine_distmat(norm(rgb2), norm(rgb)),
                               pids, pids)
    assert cross_map < 0.6, f"cross-modal pixels too easy: {cross_map}"
    assert same_map > cross_map + 0.1, (same_map, cross_map)
