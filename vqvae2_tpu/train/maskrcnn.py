"""Mask R-CNN trainer — TPU rebuild of reference ``fashion.py`` (Mask-RCNN on
ModaNet COCO with masks, driven through ``vision/engine.train_one_epoch`` /
``evaluate``).

One jitted step: backbone+FPN+RPN forward, per-image anchor matching, static
top-K proposal decode (stop-gradient boxes into the RoI heads), RoI/mask
target assignment, combined loss, Adam.  Eval: host NMS over RoI scores +
box AP (COCO-style) and mean mask IoU of matched detections.
"""

from __future__ import annotations

import argparse
import functools
import math
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from vqvae2_tpu import parallel as par
from vqvae2_tpu.detection import boxes as B
from vqvae2_tpu.detection import mask_rcnn as M
from vqvae2_tpu.detection.coco_eval import (evaluate_detections,
                                            evaluate_segmentations)
from vqvae2_tpu.detection.data import CocoDetectionDataset, make_synthetic_coco


class MRState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def make_train_step(model: M.MaskRCNN, tx, anchors: np.ndarray):
    anchors_j = jnp.asarray(anchors)

    def loss_fn(params, batch_stats, imgs, gt_boxes, gt_labels, gt_masks):
        variables = {"params": params, "batch_stats": batch_stats}
        (rpn_obj, rpn_reg, p2), new_vars = model.apply(
            variables, imgs, train=True, mutable=["batch_stats"])

        obj_t, delta_t = jax.vmap(
            lambda b, l: M.rpn_targets(anchors_j, b, l))(gt_boxes, gt_labels)
        proposals, _ = M.decode_proposals(anchors_j, rpn_obj, rpn_reg,
                                          model.num_proposals)
        proposals = jax.lax.stop_gradient(proposals)
        # Inject the GT boxes as extra RoIs (torchvision's add_gt_proposals,
        # roi_heads.py): before the RPN warms up every top-K proposal is
        # background, the heads collapse to it and never recover — the
        # round-4 zero-AP failure.  Padded gt rows are degenerate → IoU 0 →
        # labeled background, so the shape stays static at K + max_boxes.
        proposals = jnp.concatenate([proposals, gt_boxes], axis=1)

        roi_labels, roi_deltas, gt_idx = jax.vmap(M.roi_targets)(
            proposals, gt_boxes, gt_labels)
        mask_t = jax.vmap(M.crop_gt_masks)(gt_masks, gt_idx, proposals)

        roi_cls, roi_reg, mask_logits = model.apply(
            variables, p2, proposals, train=True, method=model.roi_outputs)

        total, metrics = M.mask_rcnn_loss(
            rpn_obj, rpn_reg, obj_t, delta_t,
            roi_cls, roi_reg, roi_labels, roi_deltas,
            mask_logits, mask_t)
        return total, (metrics, new_vars["batch_stats"])

    # Donate the state: params/opt/EMA buffers are rewritten in place,
    # halving peak HBM for the step (XLA aliases in->out buffers).
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: MRState, imgs, gt_boxes, gt_labels, gt_masks):
        (_, (metrics, batch_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, imgs,
                                   gt_boxes, gt_labels, gt_masks)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             batch_stats=batch_stats,
                             opt_state=opt_state), metrics

    return train_step


def evaluate_instances(model: M.MaskRCNN, state: MRState, dataset,
                       anchors: np.ndarray, batch_size: int = 4,
                       score_thresh: float = 0.05, nms_iou: float = 0.5,
                       mask_thresh: float = 0.5,
                       viz_dir: str = "", viz_max: int = 16):
    """Host-side inference: NMS'd boxes → COCO box AP, COCO mask AP
    (pycocotools ``segm`` semantics via ``evaluate_segmentations``) and mean
    mask IoU of matched detections (the fashion.py evaluation axes,
    ``vision/coco_eval.py:20-200`` bbox+segm)."""
    anchors_j = jnp.asarray(anchors)

    @jax.jit
    def forward(params, batch_stats, imgs):
        variables = {"params": params, "batch_stats": batch_stats}
        rpn_obj, rpn_reg, p2 = model.apply(variables, imgs)
        proposals, _ = M.decode_proposals(anchors_j, rpn_obj, rpn_reg,
                                          model.num_proposals)
        roi_cls, roi_reg, mask_logits = model.apply(
            variables, p2, proposals, method=model.roi_outputs)
        # apply roi box deltas
        pxywh = jax.vmap(B.cxcywh_from_ltrb)(proposals)
        cx = roi_reg[..., 0] * pxywh[..., 2] + pxywh[..., 0]
        cy = roi_reg[..., 1] * pxywh[..., 3] + pxywh[..., 1]
        w = jnp.exp(jnp.clip(roi_reg[..., 2], -4, 4)) * pxywh[..., 2]
        h = jnp.exp(jnp.clip(roi_reg[..., 3], -4, 4)) * pxywh[..., 3]
        boxes = jax.vmap(B.ltrb_from_cxcywh)(jnp.stack([cx, cy, w, h], -1))
        probs = jax.nn.softmax(roi_cls, axis=-1)
        return (jnp.clip(boxes, 0, 1), probs,
                jax.nn.sigmoid(mask_logits))

    preds, gts, mask_ious = [], [], []
    seg_preds, seg_gts = [], []
    for imgs, gt_boxes, gt_labels, img_ids, gt_masks in dataset.batches(
            batch_size, shuffle=False, drop_last=False, with_masks=True):
        boxes, probs, masks = forward(state.params, state.batch_stats,
                                      jnp.asarray(imgs))
        boxes, probs, masks = map(np.asarray, (boxes, probs, masks))
        size = imgs.shape[1]
        for bi, img_id in enumerate(img_ids):
            cls = probs[bi, :, 1:]  # drop background
            best_c = cls.argmax(-1) + 1
            best_s = cls.max(-1)
            sel = best_s > score_thresh
            valid = gt_labels[bi] > 0
            g_boxes = gt_boxes[bi][valid] * size
            g_masks = gt_masks[bi][valid] > 0.5
            if sel.any():
                keep = B.nms_numpy(boxes[bi][sel], best_s[sel], nms_iou)
                kb = boxes[bi][sel][keep]
                ks = best_s[sel][keep]
                kc = best_c[sel][keep]
                km = masks[bi][sel][keep]
                preds.append((img_id, kb * size, ks, kc))
                pasted = np.stack([
                    _paste_mask(km[d, :, :, kc[d]], kb[d], size, mask_thresh)
                    for d in range(len(kb))])
                seg_preds.append((img_id, pasted, ks, kc))
                # mean mask IoU vs best box-overlapping GT (legacy axis)
                for d in range(len(kb)):
                    if len(g_boxes) == 0:
                        continue
                    ious = _box_iou_np(kb[d] * size, g_boxes)
                    gi = int(ious.argmax())
                    if ious[gi] < 0.3:
                        continue
                    gm = g_masks[gi]
                    inter = np.logical_and(pasted[d], gm).sum()
                    union = np.logical_or(pasted[d], gm).sum()
                    if union:
                        mask_ious.append(inter / union)
            else:
                preds.append((img_id, np.zeros((0, 4)), np.zeros(0),
                              np.zeros(0, np.int64)))
                seg_preds.append((img_id, np.zeros((0, size, size), bool),
                                  np.zeros(0), np.zeros(0, np.int64)))
            gts.append((img_id, g_boxes, gt_labels[bi][valid]))
            seg_gts.append((img_id, g_masks, gt_labels[bi][valid]))
            if viz_dir and len(preds) <= viz_max:
                from vqvae2_tpu.detection.visualize import save_detections

                _, pb, ps, pc = preds[-1]
                save_detections(
                    f"{viz_dir}/inst_{img_id:05d}.png", imgs[bi], pb, pc, ps,
                    masks=seg_preds[-1][1],
                    gt_boxes=g_boxes, gt_labels=gt_labels[bi][valid],
                    class_names=getattr(dataset, "class_names", None),
                    score_thresh=0.3)
    out = evaluate_detections(preds, gts)
    seg = evaluate_segmentations(seg_preds, seg_gts)
    out["mask_mAP"] = seg["mAP"]
    out["mask_AP50"] = seg["AP50"]
    out["mask_AP75"] = seg["AP75"]
    out["mask_mIoU"] = float(np.mean(mask_ious)) if mask_ious else 0.0
    return out


def _box_iou_np(box, boxes):
    lt = np.maximum(box[:2], boxes[:, :2])
    rb = np.minimum(box[2:], boxes[:, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[:, 0] * wh[:, 1]
    a = (box[2] - box[0]) * (box[3] - box[1])
    b = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return inter / np.clip(a + b - inter, 1e-10, None)


def _paste_mask(mask28: np.ndarray, box: np.ndarray, size: int,
                thresh: float) -> np.ndarray:
    """Resize a 28×28 mask into its box on a (size, size) canvas."""
    import cv2

    out = np.zeros((size, size), bool)
    x0, y0, x1, y1 = (np.clip(box, 0, 1) * size).astype(int)
    if x1 <= x0 or y1 <= y0:
        return out
    m = cv2.resize(mask28.astype(np.float32), (x1 - x0, y1 - y0))
    out[y0:y1, x0:x1] = m > thresh
    return out


def train(args):
    mesh = par.default_mesh()
    dataset = CocoDetectionDataset(args.img_dir, args.ann_file,
                                   size=args.size, with_masks=True,
                                   max_boxes=args.max_boxes)
    steps_per_epoch = max(len(dataset) // args.batch_size, 1)
    total_steps = args.steps or steps_per_epoch * args.epoch

    model = M.MaskRCNN(num_classes=dataset.num_classes, img_size=args.size,
                       num_proposals=args.num_proposals, arch=args.arch)
    sizes = tuple(int(s) for s in args.anchor_sizes.split(","))
    anchors = M.generate_anchors(args.size, sizes=sizes)
    tx = optax.adam(args.lr)

    variables = model.init(jax.random.PRNGKey(args.seed),
                           jnp.zeros((1, args.size, args.size, 3)))
    # touch RoI heads at init
    p2 = jnp.zeros((1, args.size // 4, args.size // 4, 128))
    rois = jnp.zeros((1, args.num_proposals, 4))
    roi_vars = model.init(jax.random.PRNGKey(args.seed + 1), p2, rois,
                          method=model.roi_outputs)
    params = {**roi_vars["params"], **variables["params"]}
    if args.pretrained:
        # pretrained-backbone surgery: keep the torchvision body, fresh heads
        # (reference fashion.py:112-123 swaps predictors on a pretrained net)
        from vqvae2_tpu.models.resnet import import_torchvision_resnet

        filled, n = import_torchvision_resnet(
            {"params": params,
             "batch_stats": variables.get("batch_stats", {})},
            args.pretrained)
        params = filled["params"]
        variables = {**variables, "batch_stats": filled["batch_stats"]}
        if par.is_primary():
            print(f"imported {n} backbone tensors from {args.pretrained}",
                  flush=True)
    state = MRState(step=jnp.zeros((), jnp.int32), params=params,
                    batch_stats=variables.get("batch_stats", {}),
                    opt_state=tx.init(params))
    state = par.replicate(state, mesh)
    step_fn = make_train_step(model, tx, anchors)

    from vqvae2_tpu.utils.metrics import CsvLogger

    csv = CsvLogger(args.metrics_csv)
    map_csv = CsvLogger(args.map_csv)
    n_done, t0, m = 0, time.perf_counter(), {}
    while n_done < total_steps:
        for imgs, gt_boxes, gt_labels, _, gt_masks in dataset.batches(
                args.batch_size, seed=args.seed + n_done, with_masks=True):
            batch = par.shard_batch({"i": imgs, "b": gt_boxes, "l": gt_labels,
                                     "m": gt_masks}, mesh)
            state, metrics = step_fn(state, batch["i"], batch["b"],
                                     batch["l"], batch["m"])
            n_done += 1
            if n_done % args.log_every == 0 and par.is_primary():
                m = par.reduce_dict(metrics)
                if not math.isfinite(m["loss"]):
                    raise SystemExit(f"Loss is {m['loss']}, stopping")
                rate = n_done * args.batch_size / (time.perf_counter() - t0)
                print(f"step {n_done}/{total_steps} loss {m['loss']:.3f} "
                      f"rpn {m['rpn_cls']:.3f}/{m['rpn_reg']:.3f} "
                      f"roi {m['roi_cls']:.3f}/{m['roi_reg']:.3f} "
                      f"mask {m['mask']:.3f} ({rate:.1f} img/s)", flush=True)
                csv.log(n_done, dict(m, img_per_s=rate))
            if (args.eval_every and n_done % args.eval_every == 0
                    and par.is_primary()):
                # periodic bbox+segm AP (the reference's per-epoch
                # vision/engine.evaluate, fashion.py:88-108)
                ev = evaluate_instances(model, state, dataset, anchors,
                                        batch_size=args.batch_size)
                row = {k: float(v) for k, v in ev.items()
                       if not k.startswith("AP50_class")}
                map_csv.log(n_done, row)
                print(f"step {n_done}: bbox mAP "
                      f"{row.get('mAP', float('nan')):.4f} mask mAP "
                      f"{row.get('mask_mAP', float('nan')):.4f}", flush=True)
            if n_done >= total_steps:
                break

    if args.eval:
        m.update(evaluate_instances(model, state, dataset, anchors,
                                    batch_size=args.batch_size,
                                    viz_dir=args.viz_dir))
        if par.is_primary():
            print({k: round(float(v), 4) for k, v in m.items()
                   if not k.startswith("AP50_class")}, flush=True)
    return m


def build_argparser():
    p = argparse.ArgumentParser(description="Mask R-CNN trainer (TPU)")
    p.add_argument("--img_dir", type=str, default="")
    p.add_argument("--ann_file", type=str, default="")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--epoch", type=int, default=20)
    p.add_argument("--steps", type=int, default=0)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--num_proposals", type=int, default=64)
    p.add_argument("--max_boxes", type=int, default=64,
                   help="GT pad slots per image; also the number of GT RoIs "
                        "injected into the head batch — set near the true "
                        "max object count to keep the RoI batch lean")
    p.add_argument("--anchor_sizes", type=str, default="32,64,128",
                   help="comma-separated anchor sizes in pixels, one per FPN "
                        "level — scale down with --size (at 64px the default "
                        "32/64/128 anchors dwarf every object)")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--arch", type=str, default="resnet18")
    p.add_argument("--pretrained", type=str, default="",
                   help="torchvision resnet state_dict (.pt) for the backbone")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--eval", action="store_true")
    p.add_argument("--viz_dir", type=str, default="",
                   help="dump annotated [pred | GT] PNGs during --eval")
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--eval_every", type=int, default=0,
                   help="run bbox+segm AP evaluation every N steps")
    p.add_argument("--map_csv", type=str, default="",
                   help="append per-evaluation AP rows to this CSV")
    p.add_argument("--metrics_csv", type=str, default="",
                   help="append per-log-step scalars to this CSV (loss curves)")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if args.synthetic:
        import tempfile

        args.img_dir, args.ann_file = make_synthetic_coco(
            tempfile.mkdtemp(prefix="coco_syn_"), size=args.size,
            with_masks=True)
    return par.launch(train, args)


if __name__ == "__main__":
    main()
