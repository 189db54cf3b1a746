"""SYSU data pipeline tests on a synthetic on-disk fixture mirroring the
reference's npy-blob layout."""

import os
import pickle

import numpy as np
import pytest

from vqvae2_tpu.data import sysu


@pytest.fixture
def sysu_dir(tmp_path, rng):
    n_ids, per_id = 8, 6
    h, w = 96, 48
    n = n_ids * per_id
    labels = np.repeat(np.arange(n_ids), per_id)
    d = tmp_path / "sysu"
    d.mkdir()
    for mod in ("rgb", "ir"):
        imgs = rng.integers(0, 255, size=(n, h, w, 3)).astype(np.uint8)
        np.save(d / f"train+Val_{mod}_resized_img.npy", imgs)
        np.save(d / f"train+Val_{mod}_resized_label.npy", labels)
        np.save(d / f"train+Val_{mod}_resized_camera.npy",
                rng.integers(1, 7, size=(n,)))
        np.save(d / f"train+Val_{mod}_resized_part.npy",
                rng.integers(0, 7, size=(n, h, w)).astype(np.uint8))
    for name, lab in (("color_pos.pkl", labels), ("thermal_pos.pkl", labels)):
        pos = {int(u): np.nonzero(lab == u)[0] for u in np.unique(lab)}
        with open(d / name, "wb") as f:
            pickle.dump(pos, f)
    return str(d)


def test_sysu_data_pairs(sysu_dir):
    ds = sysu.SYSUData(sysu_dir)
    assert ds.num_class == 8
    rgb, ir, t1, t2, c1, c2 = ds[0]
    assert rgb.shape == (96, 48, 3) and ir.shape == (96, 48, 3)
    assert rgb.dtype == np.float32
    # normalized space: roughly zero-centered
    assert abs(float(rgb.mean())) < 2.0


def test_identity_sampler_pk(sysu_dir):
    ds = sysu.SYSUData(sysu_dir)
    sampler = ds.samplize(batch_size=4, num_pos=2)
    # paired labels must match positionally (P×K structure)
    lab_c = ds.train_color_label[ds.c_index]
    lab_t = ds.train_ir_label[ds.t_index]
    np.testing.assert_array_equal(lab_c, lab_t)
    # each consecutive num_pos block is one identity
    blocks = lab_c[: 4 * 2].reshape(4, 2)
    assert all(len(np.unique(b)) == 1 for b in blocks)
    # 4 distinct identities per batch
    assert len(np.unique(blocks[:, 0])) == 4


def test_sysu_part_mode(sysu_dir):
    ds = sysu.SYSUData(sysu_dir, part=True)
    out = ds[3]
    assert len(out) == 10
    rgb, ir, t1, t2, c1, c2, p1, p2, gray, p3 = out
    assert rgb.shape == (84, 36, 3)  # -12 crop margin
    assert p1.shape == (84, 36)
    assert gray.shape == (84, 36, 3)
    # gray view: all three channels equal pre-normalization is destroyed by
    # per-channel imagenet norm; check part maps hold labels or 255
    assert set(np.unique(p1)).issubset(set(range(7)) | {255})


def test_rgb2gray_and_random_channel(rng):
    img = rng.integers(0, 255, size=(8, 8, 3)).astype(np.uint8)
    g = sysu.rgb2gray(img)
    assert g.shape == (8, 8)
    rc = sysu.rgb2random_channel(img, rng)
    assert rc.shape == (8, 8)
    # convex combination stays in range
    assert rc.min() >= 0 and rc.max() <= 255


def test_process_sysu(tmp_path, rng):
    # fabricate the SYSU directory layout: camN/id/img
    root = tmp_path / "SYSU-MM01"
    (root / "exp").mkdir(parents=True)
    ids = [1, 2, 7]
    with open(root / "exp" / "test_id.txt", "w") as f:
        f.write(",".join(str(i) for i in ids) + "\n")
    from PIL import Image

    for cam in ("cam1", "cam2", "cam3", "cam4", "cam5", "cam6"):
        for pid in ids:
            d = root / cam / ("%04d" % pid)
            d.mkdir(parents=True)
            for k in range(2):
                Image.new("RGB", (10, 20)).save(d / f"{k:04d}.jpg")

    files, pids, cams = sysu.process_sysu(str(root), data="query", mode="all")
    assert set(pids) == set(ids)
    assert set(cams) == {3, 6}
    assert len(files) == 3 * 2 * 2  # 3 ids x 2 cams x 2 imgs

    gfiles, gpids, gcams = sysu.process_sysu(str(root), data="gallery",
                                             mode="all", single_shot=True)
    # single-shot: one image per (id, cam); 4 gallery cams
    assert len(gfiles) == 3 * 4
    assert set(gcams) == {1, 2, 4, 5}

    td = sysu.TestData(gfiles[:4], gpids[:4], gcams[:4], img_size=(36, 72))
    img, lab, cam = td[0]
    assert img.shape == (72, 36, 3)
    batches = list(td.batches(3))
    assert batches[0][0].shape == (3, 72, 36, 3)
