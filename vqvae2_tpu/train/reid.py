"""Cross-modal ReID + part-parsing trainer — TPU rebuild of reference
``train_reid.py``.

Loss assembly mirrors ``train_reid.py:97-149``: gated parsing criterion
(samples whose parts cover <15% of pixels are excluded — here via label
masking to keep shapes static), part-wise InfoNCE over three rearrangements,
per-part CE + concatenated-part CE, cross-modal batch-hard triplets over the
(color, thermal, gray) splits, and the ×10 color↔gray feature MSE.

Optimizer mirrors ``train_reid.py:244-257``: Nesterov SGD (wd 5e-4), the
backbone at 0.01× the classifier LR (bottleneck+classifier at full LR), and
MultiStepLR [20,40,60,100] γ=0.1 over epochs.  One jitted train step carries
everything; batches shard over the data mesh axis.
"""

from __future__ import annotations

import argparse
import functools
import time
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct, traverse_util

from vqvae2_tpu import losses as L
from vqvae2_tpu import parallel as par
from vqvae2_tpu.data.datasets import epoch_row_batches
from vqvae2_tpu.data.sysu import SYSUData
from vqvae2_tpu.part import criterion as C
from vqvae2_tpu.part.part_model import EmbedNet2
from vqvae2_tpu.utils.checkpoint import CheckpointManager
from vqvae2_tpu.utils.metrics import CsvLogger
from vqvae2_tpu.utils.schedules import multi_step_lr

IMG_H, IMG_W = 288, 144


class ReidState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(lr_f: float, steps_per_epoch: int):
    """Base params at 0.01×, bottleneck/classifier at 1× (train_reid.py:244-254),
    both following MultiStepLR over epochs."""
    sched = multi_step_lr(1.0, [m * steps_per_epoch for m in (20, 40, 60, 100)])

    def sgd(scale):
        return optax.chain(
            optax.add_decayed_weights(5e-4),
            optax.sgd(learning_rate=lambda s: lr_f * scale * sched(s),
                      momentum=0.9, nesterov=True),
        )

    def label_fn(params):
        flat = traverse_util.flatten_dict(params)
        labels = {}
        for k in flat:
            top = k[0]
            labels[k] = ("cls" if top in ("bottleneck", "classifier")
                         else "base")
        return traverse_util.unflatten_dict(labels)

    return optax.multi_transform({"base": sgd(0.01), "cls": sgd(1.0)}, label_fn)


def make_loss_fn(model: EmbedNet2, num_pos: int, batch_ids: int,
                 img_hw=(IMG_H, IMG_W)):
    """The full ReID + part-parsing objective (reference loss assembly,
    ``train_reid.py:97-149``) as a pure ``(params, batch_stats, batch, rng)
    -> (loss, (batch_stats, metrics))`` function — shared by the single-step
    and grad-accum train steps and unit-testable in isolation."""
    n_part = model.part_num - 1

    def loss_fn(params, batch_stats, batch, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        out, new_vars = model.apply(
            variables, xRGB=batch["rgb"], xIR=batch["ir"], xZ=batch["gray"],
            modal=0, train=True, mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        # bf16 compute stops at the model boundary: losses (CE, triplet
        # margins, InfoNCE logits) run in fp32 regardless of model dtype
        out = jax.tree.map(lambda x: x.astype(jnp.float32), out)
        (feat, score, part_preds, _, parts_feat_x3, parts_feat, part_masks,
         parts_score, feats_p, score_p) = out

        labels1 = batch["label"]
        labels = jnp.concatenate([labels1, labels1, labels1], axis=0)
        part_labels = jnp.concatenate(
            [batch["part1"], batch["part2"], batch["part1"]], axis=0)

        # gate: samples with parts covering <15% of pixels excluded via
        # masking labels to ignore (train_reid.py:97-98, jit-safe form)
        coverage = jnp.sum(part_labels != 0, axis=(1, 2))
        good = coverage > int(img_hw[0] * img_hw[1] * 0.15)
        gated = jnp.where(good[:, None, None], part_labels, C.IGNORE)
        edges = C.generate_edge(gated).astype(jnp.int32)
        edges = jnp.where(good[:, None, None], edges, C.IGNORE)
        (parsing, fusion), (edge_pred,) = part_preds[0], part_preds[1]
        part_loss = C.criterion_all([parsing, fusion], [edge_pred],
                                    gated, edges)

        # part-wise InfoNCE (train_reid.py:102-108)
        m = 3
        bsz = labels1.shape[0]
        n_ids = batch_ids

        def regroup(x):  # '(m n p) ... -> n (p m) ...'
            rest = x.shape[1:]
            return (x.reshape(m, n_ids, num_pos, *rest)
                    .transpose(1, 2, 0, *range(3, 3 + len(rest)))
                    .reshape(n_ids, num_pos * m, *rest))

        f_p = regroup(feats_p)          # (n, p·m, 6·256)
        f2 = regroup(parts_feat)        # (n, p·m, 6, C)
        cont2 = sum(C.contrastive_loss(f2[i]) for i in range(n_ids)) / n_ids
        cont3 = C.contrastive_loss(f_p.transpose(1, 0, 2))
        unsup_part = C.contrastive_loss(parts_feat_x3.reshape(
            parts_feat_x3.shape[0], n_part, -1)) + cont2 + cont3

        # id losses (train_reid.py:115-119)
        ce = lambda lg, lb: optax.softmax_cross_entropy_with_integer_labels(
            lg, lb).mean()
        loss_id_parts = sum(ce(ps, labels) / n_part for ps in parts_score) \
            + ce(score_p, labels)
        loss_id_real = ce(score, labels)
        acc = jnp.mean(jnp.argmax(score, axis=-1) == labels)

        # cross-modal triplets (train_reid.py:121-129)
        cf, tf, gf = jnp.split(feat, 3, axis=0)
        cl = tl = gl = labels1
        loss_tri = (L.cross_triplet_loss(cf, tf, gf, cl, tl, gl)
                    + L.cross_triplet_loss(tf, gf, cf, tl, gl, cl)
                    + L.cross_triplet_loss(gf, cf, tf, gl, cl, tl)) / 3
        loss_c2g = 10.0 * jnp.mean(jnp.square(cf - gf))

        total = loss_id_real + loss_tri + part_loss + unsup_part \
            + loss_id_parts + loss_c2g
        metrics = {"loss": total, "id": loss_id_real, "tri": loss_tri,
                   "part": part_loss, "unsup": unsup_part,
                   "id_parts": loss_id_parts, "c2g": loss_c2g, "acc": acc}
        return total, (new_vars["batch_stats"], metrics)

    return loss_fn


def make_train_step(model: EmbedNet2, tx, num_pos: int, batch_ids: int,
                    img_hw=(IMG_H, IMG_W), grad_accum: int = 1):
    """``grad_accum > 1`` scans K P×K-structured microbatches inside the ONE
    jitted program (the pattern of ``train/vqvae.py::make_train_step``): the
    traced graph stays microbatch-sized (the remote-compile ceiling
    workaround, CLAUDE.md), gradients are summed then averaged, one SGD
    update fires at the end.  Per-microbatch triplet/InfoNCE semantics match
    the reference's DDP exactly — each rank there computes batch-hard losses
    over its LOCAL batch and averages gradients
    (``/root/reference/train_reid.py:44-194`` under the DDP wrap).  BN
    running stats advance through the scan carry; dropout keys fold per
    microbatch.  The batch must then arrive as ``(grad_accum, rows, ...)``
    (see ``par.shard_microbatches``)."""
    loss_fn = make_loss_fn(model, num_pos, batch_ids, img_hw)

    # Donate the state: params/opt/EMA buffers are rewritten in place,
    # halving peak HBM for the step (XLA aliases in->out buffers).
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: ReidState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (_, (batch_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             batch_stats=batch_stats,
                             opt_state=opt_state), metrics

    if grad_accum == 1:
        return train_step

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step_accum(state: ReidState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)

        def micro(carry, xm):
            bstats, gsum = carry
            idx, b = xm
            (_, (new_bstats, metrics)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, bstats, b,
                                       jax.random.fold_in(rng, idx))
            gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
            return (new_bstats, gsum), metrics

        zeros = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
        (batch_stats, gsum), ms = jax.lax.scan(
            micro, (state.batch_stats, zeros),
            (jnp.arange(grad_accum), batch))
        grads = jax.tree_util.tree_map(lambda g: g / grad_accum, gsum)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = jax.tree_util.tree_map(lambda a: jnp.mean(a, axis=0), ms)
        return state.replace(step=state.step + 1, params=params,
                             batch_stats=batch_stats,
                             opt_state=opt_state), metrics

    return train_step_accum


def make_part_viz_fn(model: EmbedNet2):
    """Eval forward returning the fused part-parsing logits and the input
    resized to their spatial grid (reference ``train_reid.py:161-170`` builds
    its sample grid from these)."""

    @jax.jit
    def fwd(params, batch_stats, rgb):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          xRGB=rgb, modal=1, with_feature=True, train=False)
        fusion = out[2][0][1].astype(jnp.float32)  # part_preds = [(parsing, fusion), (edge,)]
        h, w = fusion.shape[1:3]
        small = jax.image.resize(rgb, (rgb.shape[0], h, w, 3), "bilinear")
        return jax.nn.softmax(fusion, axis=-1), small

    return fwd


def dump_part_samples(viz_fn, state: "ReidState", batch, path: str,
                      n_part: int = 7, max_rows: int = 16) -> None:
    """One grid row per example: [image, GT part map, predicted part map,
    per-class probability maps] — the reference's part grid
    (``train_reid.py:161-170``, nrow = 3 + n_part)."""
    from vqvae2_tpu.utils.image import save_image

    probs, small = viz_fn(state.params, state.batch_stats, batch["rgb"])
    probs, small = np.asarray(probs), np.asarray(small)
    k = min(probs.shape[0], max_rows)
    h, w = probs.shape[1:3]

    # GT labels → nearest-neighbour resize to the prediction grid
    gt = np.asarray(batch["part1"])[:k].astype(np.float32)
    yi = (np.arange(h) * gt.shape[1] / h).astype(np.int64)
    xi = (np.arange(w) * gt.shape[2] / w).astype(np.int64)
    gt = gt[:, yi][:, :, xi]
    gt = np.where(gt < 0, 0.0, gt)  # IGNORE padding → background

    to3 = lambda m: np.repeat(m[..., None], 3, axis=-1) * 2.0 - 1.0
    rows = []
    for i in range(k):
        cols = [small[i],
                to3(gt[i] / max(n_part - 1, 1)),
                to3(np.argmax(probs[i], -1) / max(n_part - 1, 1))]
        cols += [to3(probs[i, :, :, c]) for c in range(probs.shape[-1])]
        rows.extend(cols)
    save_image(np.stack(rows), path, nrow=3 + probs.shape[-1])


def make_synthetic_sysu(tmpdir: str, n_ids: int = 8, per_id: int = 8,
                        h: int = IMG_H, w: int = IMG_W, seed: int = 0):
    """Fabricate the SYSU npy-blob layout for smoke runs."""
    import os

    rng = np.random.default_rng(seed)
    os.makedirs(tmpdir, exist_ok=True)
    n = n_ids * per_id
    labels = np.repeat(np.arange(n_ids), per_id)
    for mod in ("rgb", "ir"):
        np.save(f"{tmpdir}/train+Val_{mod}_resized_img.npy",
                rng.integers(0, 255, size=(n, h, w, 3)).astype(np.uint8))
        np.save(f"{tmpdir}/train+Val_{mod}_resized_label.npy", labels)
        np.save(f"{tmpdir}/train+Val_{mod}_resized_camera.npy",
                rng.integers(1, 7, size=(n,)))
        part = rng.integers(0, 7, size=(n, h, w)).astype(np.uint8)
        np.save(f"{tmpdir}/train+Val_{mod}_resized_part.npy", part)
    return tmpdir


def collate(rows, img_hw=(IMG_H, IMG_W)) -> Dict[str, np.ndarray]:
    rgb = np.stack([r[0] for r in rows])
    ir = np.stack([r[1] for r in rows])
    label = np.asarray([r[2] for r in rows], np.int32)
    p1 = np.stack([r[6] for r in rows]).astype(np.int32)
    p2 = np.stack([r[7] for r in rows]).astype(np.int32)
    gray = np.stack([r[8] for r in rows])
    # pad crops back to the full size so shapes stay static across epochs
    def pad(x, value=0):
        ph, pw = img_hw[0] - x.shape[1], img_hw[1] - x.shape[2]
        widths = [(0, 0), (0, ph), (0, pw)] + [(0, 0)] * (x.ndim - 3)
        return np.pad(x, widths, constant_values=value)
    return {"rgb": pad(rgb), "ir": pad(ir), "gray": pad(gray),
            "label": label, "part1": pad(p1, C.IGNORE), "part2": pad(p2, C.IGNORE)}


def train(args):
    mesh = par.default_mesh()
    dataset = SYSUData(args.path, part=True, seed=args.seed)
    loader_batch = args.batch_size * args.num_pos
    steps_per_epoch = max(len(dataset) // (loader_batch * args.grad_accum), 1)
    total_steps = args.steps or steps_per_epoch * args.epoch

    model = EmbedNet2(class_num=dataset.num_class, arch=args.arch,
                      dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    tx = make_optimizer(args.lr_F, steps_per_epoch)

    img_hw = dataset.train_color_image.shape[1:3]
    probe = jnp.zeros((1, *img_hw, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(args.seed), xRGB=probe, xIR=probe,
                           xZ=probe, modal=0, train=True)
    if args.pretrained:
        # each modality stem + the shared trunk get the same pretrained base
        # (the reference's deep copies of a pretrained resnet, model.py:79-123)
        from vqvae2_tpu.models.resnet import import_torchvision_resnet

        variables, n = import_torchvision_resnet(dict(variables),
                                                 args.pretrained)
        if par.is_primary():
            print(f"imported {n} backbone tensors from {args.pretrained}",
                  flush=True)
    state = ReidState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                      batch_stats=variables["batch_stats"],
                      opt_state=tx.init(variables["params"]))
    state = par.replicate(state, mesh)
    step_fn = make_train_step(model, tx, args.num_pos, args.batch_size, img_hw,
                              grad_accum=args.grad_accum)
    viz_fn = make_part_viz_fn(model) if args.sample_dir else None
    # hardware-RNG dropout stream (see train/pixelsnail.py)
    rng = jax.random.key(args.seed + 1, impl="unsafe_rbg")

    ckpt = CheckpointManager(args.ckpt_dir, config=vars(args)) if args.ckpt_dir else None
    csv = CsvLogger(args.metrics_csv)
    map_csv = CsvLogger(args.map_csv)
    n_done, t0, m = 0, time.perf_counter(), {}
    epoch, accum, buf = 0, args.grad_accum, []
    while n_done < total_steps:
        epoch += 1
        dataset.samplize(args.batch_size, args.num_pos)
        for rows in epoch_row_batches(dataset, loader_batch):
            buf.append(collate(rows, img_hw))
            if len(buf) < accum:
                continue
            viz_batch, micro = buf[-1], buf
            buf = []
            if accum == 1:
                batch = par.shard_batch(micro[0], mesh)
            else:
                batch = par.shard_microbatches(
                    {k: np.stack([b[k] for b in micro]) for k in micro[0]},
                    mesh)
            state, metrics = step_fn(state, batch, rng)
            n_done += 1
            if n_done % args.log_every == 0 and par.is_primary():
                m = par.reduce_dict(metrics)
                rate = (n_done * loader_batch * accum
                        / (time.perf_counter() - t0))
                print(f"step {n_done}/{total_steps} loss {m['loss']:.3f} "
                      f"id {m['id']:.3f} tri {m['tri']:.3f} part {m['part']:.3f} "
                      f"acc {m['acc']:.3f} ({rate:.1f} img/s)", flush=True)
                csv.log(n_done, dict(m, img_per_s=rate))
            if (viz_fn is not None and n_done % args.sample_every == 0
                    and par.is_primary()):
                dump_part_samples(viz_fn, state, viz_batch,
                                  f"{args.sample_dir}/part_{n_done:05d}.png",
                                  n_part=model.part_num)
            if n_done >= total_steps:
                break
        if (args.eval_every and args.eval_path
                and epoch % args.eval_every == 0 and par.is_primary()):
            # periodic CMC/mAP validation (reference train_reid.py:267-274)
            from vqvae2_tpu.eval.reid import validate

            mAP = validate(model, {"params": state.params,
                                   "batch_stats": state.batch_stats},
                           args.eval_path, img_size=(img_hw[1], img_hw[0]),
                           trials=args.eval_trials)
            m["mAP"] = mAP
            map_csv.log(n_done, {"epoch": epoch, "mAP": mAP})
            if ckpt and ckpt.save_best(mAP, state):
                print(f"epoch {epoch}: new best mAP {mAP:.4f}", flush=True)
    if ckpt:
        ckpt.save_last(state)
    return m


def build_argparser():
    p = argparse.ArgumentParser(description="ReID + part parsing trainer (TPU)")
    p.add_argument("--path", type=str, default="")
    p.add_argument("--epoch", type=int, default=200)
    p.add_argument("--steps", type=int, default=0)
    p.add_argument("--batch_size", type=int, default=6, help="identities P")
    p.add_argument("--num_pos", type=int, default=4, help="instances K")
    p.add_argument("--lr_F", type=float, default=0.1)
    p.add_argument("--arch", type=str, default="resnet50")
    p.add_argument("--pretrained", type=str, default="",
                   help="torchvision resnet state_dict (.pt) for the backbone")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--ckpt_dir", type=str, default="")
    p.add_argument("--img_h", type=int, default=IMG_H)
    p.add_argument("--img_w", type=int, default=IMG_W)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--sample_dir", type=str, default="",
                   help="dump part-parsing grids here (reference sample/)")
    p.add_argument("--sample_every", type=int, default=300)
    p.add_argument("--eval_every", type=int, default=0,
                   help="validate CMC/mAP every N epochs (reference: 4)")
    p.add_argument("--eval_path", type=str, default="",
                   help="raw SYSU-MM01 root (cam1..cam6 + exp/test_id.txt)")
    p.add_argument("--eval_trials", type=int, default=1)
    p.add_argument("--grad_accum", type=int, default=1,
                   help="scan K P×K microbatches inside one jitted step "
                        "(one SGD update per superbatch; see make_train_step)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 conv/matmul compute (fp32 params, fp32 "
                        "losses and BN statistics)")
    p.add_argument("--metrics_csv", type=str, default="",
                   help="append per-step scalar metrics to this CSV")
    p.add_argument("--map_csv", type=str, default="",
                   help="append per-validation (epoch, mAP) rows to this CSV")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if args.synthetic:
        import tempfile

        args.path = make_synthetic_sysu(tempfile.mkdtemp(prefix="sysu_syn_"),
                                        h=args.img_h, w=args.img_w)
    return par.launch(train, args)


if __name__ == "__main__":
    main()
