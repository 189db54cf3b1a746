"""Detection trainer + evaluator — TPU rebuild of the ModaNet fashion
workload (reference ``fashionSSD.py`` + ``vision/engine.py``): SSD over COCO
bbox annotations, MultiBox loss with warmup LR, NaN abort
(``vision/engine.py:40-43``), and COCO-style AP evaluation with NMS.

Run: ``python -m vqvae2_tpu.train.detection --synthetic --steps 10``.
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
from vqvae2_tpu.detection.coco_eval import evaluate_detections
from vqvae2_tpu.detection.data import CocoDetectionDataset, make_synthetic_coco
from vqvae2_tpu.detection.ssd import SSD300


class DetState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def make_train_step(model: SSD300, tx, dboxes: np.ndarray):
    db = jnp.asarray(dboxes)
    db_ltrb = B.ltrb_from_cxcywh(db)

    def loss_fn(params, batch_stats, imgs, gt_boxes, gt_labels):
        (loc, conf), new_vars = model.apply(
            {"params": params, "batch_stats": batch_stats}, imgs, train=True,
            mutable=["batch_stats"])
        loc_t, cls_t = jax.vmap(
            lambda g, l: B.encode_targets(g, l, db_ltrb, db))(gt_boxes,
                                                              gt_labels)
        loss = B.multibox_loss(loc, conf, loc_t, cls_t)
        return loss, new_vars["batch_stats"]

    # Donate the state: params/opt/EMA buffers are rewritten in place,
    # halving peak HBM for the step (XLA aliases in->out buffers).
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: DetState, imgs, gt_boxes, gt_labels):
        (loss, batch_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, imgs,
                                   gt_boxes, gt_labels)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             batch_stats=batch_stats,
                             opt_state=opt_state), loss

    return train_step


def evaluate(model: SSD300, state: DetState, dataset, dboxes: np.ndarray,
             batch_size: int = 8, score_thresh: float = 0.05,
             nms_iou: float = 0.45, max_det: int = 100,
             viz_dir: str = "", viz_max: int = 16):
    """NMS + COCO AP (reference ``vision/engine.evaluate`` +
    ``Encoder.decode_single``); with ``viz_dir``, dumps annotated
    [prediction | GT] PNGs (reference ``fashionSSD.py:147-184``)."""
    db = jnp.asarray(dboxes)

    @jax.jit
    def forward(params, batch_stats, imgs):
        loc, conf = model.apply({"params": params,
                                 "batch_stats": batch_stats}, imgs)
        return B.decode_boxes(loc, db), jax.nn.softmax(conf, axis=-1)

    preds, gts = [], []
    for imgs, gt_boxes, gt_labels, img_ids in dataset.batches(
            batch_size, shuffle=False, drop_last=False):
        boxes, probs = forward(state.params, state.batch_stats,
                               jnp.asarray(imgs))
        boxes, probs = np.asarray(boxes), np.asarray(probs)
        for bi, img_id in enumerate(img_ids):
            out_b, out_s, out_l = [], [], []
            for c in range(1, probs.shape[-1]):
                sc = probs[bi, :, c]
                sel = sc > score_thresh
                if not sel.any():
                    continue
                keep = B.nms_numpy(boxes[bi][sel], sc[sel], nms_iou)
                out_b.append(boxes[bi][sel][keep])
                out_s.append(sc[sel][keep])
                out_l.append(np.full(len(keep), c))
            if out_b:
                ob = np.concatenate(out_b)
                os_ = np.concatenate(out_s)
                ol = np.concatenate(out_l)
                top = np.argsort(-os_)[:max_det]
                preds.append((img_id, ob[top], os_[top], ol[top]))
            else:
                preds.append((img_id, np.zeros((0, 4)), np.zeros(0),
                              np.zeros(0, np.int64)))
            valid = gt_labels[bi] > 0
            gts.append((img_id, gt_boxes[bi][valid], gt_labels[bi][valid]))
            if viz_dir and len(preds) <= viz_max:
                from vqvae2_tpu.detection.visualize import save_detections

                _, pb, ps, pl = preds[-1]
                save_detections(
                    f"{viz_dir}/det_{img_id:05d}.png", imgs[bi], pb, pl, ps,
                    gt_boxes=gt_boxes[bi][valid], gt_labels=gt_labels[bi][valid],
                    class_names=getattr(dataset, "class_names", None),
                    score_thresh=0.3)
    return evaluate_detections(preds, gts)


def train(args):
    mesh = par.default_mesh()
    dataset = CocoDetectionDataset(args.img_dir, args.ann_file, size=args.size)
    steps_per_epoch = max(len(dataset) // args.batch_size, 1)
    total_steps = args.steps or steps_per_epoch * args.epoch

    if args.size != 300:
        raise SystemExit("SSD300's default-box grid is fixed to 300px input "
                         "(reference ssd/model.py); use --size 300")
    model = SSD300(num_classes=dataset.num_classes, arch=args.arch)
    warmup = min(1000, total_steps // 10 + 1)
    sched = optax.linear_schedule(args.lr / 100, args.lr, warmup)
    tx = optax.sgd(sched, momentum=0.9)

    dboxes = B.default_boxes_ssd300(fig_size=args.size)
    variables = model.init(jax.random.PRNGKey(args.seed),
                           jnp.zeros((1, args.size, args.size, 3)))
    if args.pretrained:
        # pretrained-backbone surgery (reference fashionSSD.py loads the
        # torchvision resnet base; heads stay fresh)
        from vqvae2_tpu.models.resnet import import_torchvision_resnet

        variables, n = import_torchvision_resnet(dict(variables),
                                                 args.pretrained)
        if par.is_primary():
            print(f"imported {n} backbone tensors from {args.pretrained}",
                  flush=True)
    state = DetState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                     batch_stats=variables["batch_stats"],
                     opt_state=tx.init(variables["params"]))
    state = par.replicate(state, mesh)
    step_fn = make_train_step(model, tx, dboxes)

    from vqvae2_tpu.utils.metrics import CsvLogger

    csv = CsvLogger(args.metrics_csv)
    map_csv = CsvLogger(args.map_csv)
    n_done, t0 = 0, time.perf_counter()
    loss = float("nan")
    while n_done < total_steps:
        for imgs, gt_boxes, gt_labels, _ in dataset.batches(
                args.batch_size, seed=args.seed + n_done):
            batch = par.shard_batch(
                {"i": imgs, "b": gt_boxes, "l": gt_labels}, mesh)
            state, loss_dev = step_fn(state, batch["i"], batch["b"], batch["l"])
            n_done += 1
            loss = float(loss_dev)
            if not math.isfinite(loss):  # NaN abort (vision/engine.py:40-43)
                raise SystemExit(f"Loss is {loss}, stopping training")
            if n_done % args.log_every == 0 and par.is_primary():
                rate = n_done * args.batch_size / (time.perf_counter() - t0)
                print(f"step {n_done}/{total_steps} loss {loss:.4f} "
                      f"({rate:.1f} img/s)", flush=True)
                csv.log(n_done, {"loss": loss, "img_per_s": rate})
            if (args.eval_every and n_done % args.eval_every == 0
                    and par.is_primary()):
                # periodic COCO AP — the quality-rises evidence the per-epoch
                # evaluate loop of reference vision/engine.py:71-109 provides
                ev = evaluate(model, state, dataset, dboxes,
                              batch_size=args.batch_size)
                row = {k: v for k, v in ev.items()
                       if not k.startswith("AP50_class")}
                map_csv.log(n_done, row)
                print(f"step {n_done}: mAP {ev.get('mAP', float('nan')):.4f} "
                      f"AP50 {ev.get('AP50', float('nan')):.4f}", flush=True)
            if n_done >= total_steps:
                break

    metrics = {"loss": loss}
    if args.eval:
        metrics.update(evaluate(model, state, dataset, dboxes,
                                batch_size=args.batch_size,
                                viz_dir=args.viz_dir))
        if par.is_primary():
            print({k: round(v, 4) for k, v in metrics.items()
                   if not k.startswith("AP50_class")}, flush=True)
    return metrics


def build_argparser():
    p = argparse.ArgumentParser(description="SSD detection trainer (TPU)")
    p.add_argument("--img_dir", type=str, default="")
    p.add_argument("--ann_file", type=str, default="")
    p.add_argument("--size", type=int, default=300)
    p.add_argument("--epoch", type=int, default=26)
    p.add_argument("--steps", type=int, default=0)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=0.002)
    p.add_argument("--arch", type=str, default="resnet18")
    p.add_argument("--pretrained", type=str, default="",
                   help="torchvision resnet state_dict (.pt) for the backbone")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--eval", action="store_true")
    p.add_argument("--viz_dir", type=str, default="",
                   help="dump annotated prediction PNGs during --eval")
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--eval_every", type=int, default=0,
                   help="run COCO AP evaluation every N steps")
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
            tempfile.mkdtemp(prefix="coco_syn_"), size=args.size)
    return par.launch(train, args)


if __name__ == "__main__":
    main()
