"""Detection stack tests: default boxes, IoU/encode/decode round-trip,
NMS, MultiBox loss, COCO-style AP, SSD forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae2_tpu.detection import boxes as B
from vqvae2_tpu.detection.coco_eval import evaluate_detections


def test_default_boxes_count():
    db = B.default_boxes_ssd300()
    assert db.shape == (8732, 4)
    assert db.min() >= 0.0 and db.max() <= 1.0


def test_iou_and_conversions():
    a = jnp.asarray([[0.0, 0.0, 1.0, 1.0]])
    b = jnp.asarray([[0.5, 0.5, 1.5, 1.5], [0.0, 0.0, 1.0, 1.0]])
    iou = B.box_iou(a, b)
    np.testing.assert_allclose(np.asarray(iou), [[0.25 / 1.75, 1.0]], rtol=1e-5)

    cx = B.cxcywh_from_ltrb(b)
    back = B.ltrb_from_cxcywh(cx)
    np.testing.assert_allclose(np.asarray(back), np.asarray(b), atol=1e-6)


def test_encode_decode_roundtrip(rng):
    db = jnp.asarray(B.default_boxes_ssd300())
    db_ltrb = B.ltrb_from_cxcywh(db)
    # one gt box well inside the grid
    gt = jnp.asarray([[0.2, 0.3, 0.6, 0.8], [0.0, 0.0, 0.0, 0.0]])
    labels = jnp.asarray([5, 0], jnp.int32)
    loc_t, cls_t = B.encode_targets(gt, labels, db_ltrb, db)
    assert int((cls_t == 5).sum()) >= 1  # at least the force-match
    # decode the target at matched boxes reproduces the gt box
    matched = np.nonzero(np.asarray(cls_t) == 5)[0]
    dec = B.decode_boxes(loc_t, db)
    np.testing.assert_allclose(
        np.asarray(dec)[matched],
        np.broadcast_to(np.asarray(gt[0]), (len(matched), 4)), atol=1e-5)


def test_nms():
    boxes = np.asarray([[0, 0, 1, 1], [0.05, 0, 1.05, 1], [2, 2, 3, 3]],
                       np.float32)
    scores = np.asarray([0.9, 0.8, 0.7])
    keep = B.nms_numpy(boxes, scores, iou_threshold=0.5)
    np.testing.assert_array_equal(keep, [0, 2])


def test_multibox_loss(rng):
    db = jnp.asarray(B.default_boxes_ssd300())
    db_ltrb = B.ltrb_from_cxcywh(db)
    gt = jnp.asarray([[[0.2, 0.3, 0.6, 0.8], [0.0, 0.0, 0.0, 0.0]]])
    labels = jnp.asarray([[5, 0]], jnp.int32)
    loc_t, cls_t = jax.vmap(
        lambda g, l: B.encode_targets(g, l, db_ltrb, db))(gt, labels)

    loc_pred = jnp.asarray(rng.normal(size=(1, 8732, 4)) * 0.1, jnp.float32)
    cls_logits = jnp.asarray(rng.normal(size=(1, 8732, 10)), jnp.float32)
    loss = B.multibox_loss(loc_pred, cls_logits, loc_t, cls_t)
    assert np.isfinite(float(loss)) and float(loss) > 0

    # perfect predictions → loss decreases
    perfect_cls = jax.nn.one_hot(cls_t, 10) * 20.0
    loss2 = B.multibox_loss(loc_t, perfect_cls, loc_t, cls_t)
    assert float(loss2) < float(loss)


def test_coco_eval_perfect_and_miss():
    gt = [(0, np.asarray([[0, 0, 10, 10], [20, 20, 30, 30]]),
           np.asarray([1, 2]))]
    perfect = [(0, np.asarray([[0, 0, 10, 10], [20, 20, 30, 30]]),
                np.asarray([0.9, 0.8]), np.asarray([1, 2]))]
    m = evaluate_detections(perfect, gt)
    assert m["mAP"] > 0.99 and m["AP50"] > 0.99

    wrong = [(0, np.asarray([[50, 50, 60, 60]]), np.asarray([0.9]),
              np.asarray([1]))]
    m2 = evaluate_detections(wrong, gt)
    assert m2["AP50"] == 0.0


@pytest.mark.slow
def test_ssd_forward(rng):
    from vqvae2_tpu.detection.ssd import SSD300

    model = SSD300(num_classes=14, arch="resnet18")
    x = jnp.asarray(rng.normal(size=(1, 300, 300, 3)), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x)
    loc, conf = model.apply(v, x)
    assert loc.shape == (1, 8732, 4)
    assert conf.shape == (1, 8732, 14)
