"""Mask R-CNN tests: anchors, RoIAlign exactness, target assignment, one full
train step + instance evaluation on tiny synthetic data."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae2_tpu.detection import mask_rcnn as M
from vqvae2_tpu.detection import boxes as B


def test_anchor_grid():
    a = M.generate_anchors(256)
    per_level = [(256 // s) ** 2 * 3 for s in (4, 8, 16)]
    assert a.shape == (sum(per_level), 4)
    # all centers in [0, 1]
    c = (a[:, :2] + a[:, 2:]) / 2
    assert c.min() >= 0 and c.max() <= 1


def test_roi_align_exact_on_linear_field(rng):
    """Bilinear sampling of a linear function must be exact."""
    h = w = 16
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    feat = np.stack([yy, xx], axis=-1).astype(np.float32)  # (h, w, 2)
    box = jnp.asarray([[0.25, 0.25, 0.75, 0.75]])
    out = M.roi_align(jnp.asarray(feat), box, 5)
    # channel 0 = y coordinate: linspace over the box in pixel units
    expect_y = np.linspace(0.25 * (h - 1), 0.75 * (h - 1), 5)
    np.testing.assert_allclose(np.asarray(out)[0, :, 0, 0], expect_y,
                               atol=1e-4)
    expect_x = np.linspace(0.25 * (w - 1), 0.75 * (w - 1), 5)
    np.testing.assert_allclose(np.asarray(out)[0, 0, :, 1], expect_x,
                               atol=1e-4)


def test_rpn_and_roi_targets(rng):
    anchors = jnp.asarray(M.generate_anchors(64))
    gt = jnp.asarray([[0.2, 0.2, 0.5, 0.5], [0.0, 0.0, 0.0, 0.0]])
    labels = jnp.asarray([3, 0], jnp.int32)
    obj, deltas = M.rpn_targets(anchors, gt, labels)
    assert int((obj == 1).sum()) >= 1  # at least force-match
    assert int((obj == 0).sum()) > 0

    props = jnp.asarray([[0.2, 0.2, 0.5, 0.5], [0.7, 0.7, 0.9, 0.9]])
    rl, rd, gi = M.roi_targets(props, gt, labels)
    assert int(rl[0]) == 3 and int(rl[1]) == 0


def test_crop_gt_masks():
    masks = jnp.zeros((2, 32, 32)).at[0, 8:24, 8:24].set(1.0)
    gt_idx = jnp.asarray([0])
    props = jnp.asarray([[0.25, 0.25, 0.75, 0.75]])  # exactly the mask box
    crop = M.crop_gt_masks(masks, gt_idx, props, out=8)
    assert float(crop.mean()) > 0.8  # mostly ones inside the box


@pytest.mark.slow
def test_maskrcnn_train_and_eval(tmp_path, forbid_replication):
    from vqvae2_tpu.train import maskrcnn as T
    from vqvae2_tpu.detection.data import make_synthetic_coco

    img_dir, ann = make_synthetic_coco(str(tmp_path), n=8, size=64,
                                       n_classes=3, with_masks=True)
    viz = tmp_path / "viz"
    # batch 8 on the 8-device mesh: one image per device, replication
    # fallback forbidden — the detection step actually-sharded (the same
    # treatment the SYSU trainer tests got in round 4)
    args = T.build_argparser().parse_args([
        "--img_dir", img_dir, "--ann_file", ann, "--size", "64",
        "--steps", "2", "--batch_size", "8", "--num_proposals", "16",
        "--max_boxes", "8",
        "--log_every", "1", "--eval", "--viz_dir", str(viz),
        "--eval_every", "2", "--map_csv", str(tmp_path / "ap.csv"),
    ])
    m = T.train(args)
    # the periodic-AP path (eval_every) must produce a header + one row
    ap_rows = (tmp_path / "ap.csv").read_text().strip().splitlines()
    assert len(ap_rows) == 2 and ap_rows[0].startswith("step,")
    for k in ("loss", "rpn_cls", "roi_cls", "mask"):
        assert np.isfinite(m[k]), f"{k} not finite: {m}"
    assert "mAP" in m and "mask_mIoU" in m
    for k in ("mask_mAP", "mask_AP50", "mask_AP75"):
        assert k in m and np.isfinite(m[k]), f"{k} missing: {m}"
    assert list(viz.glob("inst_*.png")), "prediction viz not dumped"


@pytest.mark.slow
def test_maskrcnn_overfit_ap50(tmp_path):
    """Quality, not schema: overfitting 8 images for 200 steps must push
    bbox AND mask AP50 past 0.5 (measured trajectory with the round-5 fix:
    0.61/0.61 at step 100, 0.76/0.76 at step 200, 1.0/0.88 at 300 — the
    round-4 zero-AP regression [RoI head collapse to background] pinned
    both at exactly 0 while the loss fell 5x, and only this assertion
    catches that class of failure before it burns a chip run)."""
    from vqvae2_tpu.train import maskrcnn as T
    from vqvae2_tpu.detection.data import make_synthetic_coco

    img_dir, ann = make_synthetic_coco(str(tmp_path), n=8, size=64,
                                       n_classes=3, with_masks=True)
    args = T.build_argparser().parse_args([
        "--img_dir", img_dir, "--ann_file", ann, "--size", "64",
        "--steps", "200", "--batch_size", "4", "--num_proposals", "32",
        "--max_boxes", "8", "--anchor_sizes", "8,16,32", "--lr", "1e-3",
        "--log_every", "100", "--eval",
    ])
    m = T.train(args)
    assert m["AP50"] > 0.5, f"bbox AP50 didn't rise: {m}"
    assert m["mask_AP50"] > 0.5, f"mask AP50 didn't rise: {m}"
