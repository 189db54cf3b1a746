"""Bidirectional cycle trainer — TPU rebuild of reference
``train_vqvae_deep_bi.py``: two VQ-VAEs (gray→IR via adaptor1, IR→gray via
adaptor2) trained with cycle reconstruction, a feature-space modality
discriminator over 2·class labels, and a warmup/stepped ReID optimizer.

Per-batch recipe (reference ``:203-320``):

1. elastic + random-box-erase augmentation of both views (``:38-60``,
   numpy here), random-channel gray from RGB;
2. **ReID step**: id CE over real + translated views, WRT self-triplets per
   modality, modal-free feature MSE, and the discriminator's real-modality CE
   (``:220-265``);
3. **cycle**: gray→IR→gray and IR→gray→IR through the two adaptors with
   styles = detached person features; cycle MSE against the channel-mean
   target + 4 latent losses (``train_cycle_rec``, ``:156-180``);
4. **generator step**: cycle loss + 0.25·latent + 0.5·(translated-view id
   loss + center-margin feature loss + discriminator fake CE) with reid and
   discriminator FROZEN (``:267-315``).

Optimizers (reference ``:438-443,81-96``): Nesterov SGD for reid with
warmup→step decay (0.1× for the backbone group) and Adam for the generators.
"""

from __future__ import annotations

import argparse
import functools
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from vqvae2_tpu import losses as L
from vqvae2_tpu import parallel as par
from vqvae2_tpu.data.datasets import epoch_row_batches
from vqvae2_tpu.data.sysu import SYSUData
from vqvae2_tpu.models.adaptive import ModelAdaptiveBi_Deep
from vqvae2_tpu.utils.image import save_image

LATENT_LOSS_WEIGHT = 0.25


# ---------------------------------------------------------------------------
# host-side augs (reference RandomCropBoxes + ElasticTransform, :38-60)
# ---------------------------------------------------------------------------

def random_crop_boxes(imgs: np.ndarray, rng: np.random.Generator, n: int = 7,
                      size: int = 30, p: float = 0.5) -> np.ndarray:
    imgs = imgs.copy()
    H, W = imgs.shape[1:3]
    for img in imgs:
        if rng.random() > p:
            continue
        h = int(rng.integers(max(size - 15, 1), size + 10))
        w = int(rng.integers(max(size - 15, 1), size + 10))
        h, w = min(h, H - 1), min(w, W - 1)
        ys = rng.integers(0, H - h, n)
        xs = rng.integers(0, W - w, n)
        for y, x in zip(ys, xs):
            img[y:y + h, x:x + w] = rng.random()
    return imgs


def elastic_transform(imgs: np.ndarray, rng: np.random.Generator,
                      alpha: float = 25.0, sigma: float = 5.0) -> np.ndarray:
    """Per-image elastic warp (torchvision ElasticTransform(alpha=25)
    equivalent) via cv2 remap."""
    import cv2

    out = np.empty_like(imgs)
    H, W = imgs.shape[1:3]
    gx, gy = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32))
    k = int(sigma * 4) | 1
    for i, img in enumerate(imgs):
        dx = cv2.GaussianBlur(
            rng.uniform(-1, 1, size=(H, W)).astype(np.float32), (k, k), sigma
        ) * alpha / W
        dy = cv2.GaussianBlur(
            rng.uniform(-1, 1, size=(H, W)).astype(np.float32), (k, k), sigma
        ) * alpha / H
        out[i] = cv2.remap(img, gx + dx * W, gy + dy * H, cv2.INTER_LINEAR,
                           borderMode=cv2.BORDER_REFLECT)
    return out


def aug_transforms(imgs: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    return random_crop_boxes(elastic_transform(imgs, rng), rng)


def reid_lr_schedule(lr_f: float, steps_per_epoch: int):
    """Warmup 10 epochs → flat → ×0.1 @20 → ×0.01 @50 (reference
    ``adjust_learning_rate``, :81-96)."""
    def sched(step):
        e = jnp.asarray(step) // steps_per_epoch
        lr = jnp.where(e < 10, lr_f * (e + 1) / 10.0,
                       jnp.where(e < 20, lr_f,
                                 jnp.where(e < 50, lr_f * 0.1, lr_f * 0.01)))
        return lr
    return sched


class BiState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    vq_stats: Any
    opt_reid: Any
    opt_gen: Any


def _split(params):
    reid = {k: params[k] for k in ("person_id", "discriminator") if k in params}
    gen = {k: v for k, v in params.items() if k not in reid}
    return reid, gen


def _cycle_forward(module: ModelAdaptiveBi_Deep, gray, ir, featV, featI):
    """Reference ``train_cycle_rec`` (:156-180); decodes expand 1→3 channels."""
    def e3(x):
        return jnp.repeat(x, 3, axis=-1) if x.shape[-1] == 1 else x

    g_b, g_t = module.encode_content_1(gray)
    g_content, lat1 = module.quantize_content_1(g_b, g_t, train=True)
    gray2ir = e3(module.decode_1(g_content, featI))

    i_b, i_t = module.encode_content_2(ir)
    i_content, lat2 = module.quantize_content_2(i_b, i_t, train=True)
    ir2gray = e3(module.decode_2(i_content, featV))

    f_b, f_t = module.encode_content_2(gray2ir)
    f_content, lat3 = module.quantize_content_2(f_b, f_t, train=True)
    gray2ir2gray = e3(module.decode_2(f_content, featV))

    r_b, r_t = module.encode_content_1(ir2gray)
    r_content, lat4 = module.quantize_content_1(r_b, r_t, train=True)
    ir2gray2ir = e3(module.decode_1(r_content, featI))

    latent = lat1 + lat2 + lat3 + lat4
    return gray2ir, ir2gray, gray2ir2gray, ir2gray2ir, latent


def make_train_step(model: ModelAdaptiveBi_Deep, tx_reid, tx_gen, num_pos: int):
    mse = lambda a, b: jnp.mean(jnp.square(a - b))
    ce = lambda lg, lb: optax.softmax_cross_entropy_with_integer_labels(
        lg, lb).mean()

    def reid_loss(reid_params, gen_params, cols, batch, inter_v, inter_i, rng):
        params = {**gen_params, **reid_params}
        variables = {"params": params, **cols}
        label1, label2 = batch["label"], batch["label"]
        bs = label1.shape[0]

        def fwd(module):
            feat, score, feat2d, act, feat2d_x3 = module.person_id(
                xRGB=batch["aug_rgb"], xIR=batch["aug_ir"], modal=0,
                with_feature=True, train=True)
            fZv = module.person_id(xRGB=None, xIR=inter_v, modal=2, train=True)
            fZi = module.person_id(xRGB=inter_i, xIR=None, modal=1, train=True)
            d_real = module.discriminate(jnp.concatenate(
                [jax.lax.stop_gradient(feat),
                 jax.lax.stop_gradient(jnp.concatenate([fZv[0], fZi[0]], 0))], 0))
            return feat, score, feat2d, feat2d_x3, fZv, fZi, d_real

        (feat, score, feat2d, feat2d_x3, (featZ_v, scoreZ_v),
         (featZ_i, scoreZ_i), d_real), new_vars = model.apply(
            variables, method=lambda m: fwd(m), mutable=["batch_stats"],
            rngs={"dropout": rng})

        featV, featI = jnp.split(feat, 2, axis=0)
        labels_all = jnp.concatenate([label1, label2, label1, label2], 0)
        loss_id = ce(jnp.concatenate([score, scoreZ_v, scoreZ_i], 0), labels_all)
        loss_tri = (L.triplet_loss_wrt(featV, label1)[0]
                    + L.triplet_loss_wrt(featI, label2)[0])
        modal_free = mse(featZ_v, jax.lax.stop_gradient(featV)) \
            + mse(featZ_i, jax.lax.stop_gradient(featI))
        # modality labels: color 2k, ir 2k+1 (reference :235-236)
        modal_true = jnp.concatenate(
            [2 * label1, 2 * label2 + 1, 2 * label1, 2 * label2 + 1], 0)
        disc_true = ce(d_real, modal_true)
        loss = loss_id + loss_tri + modal_free + disc_true
        aux = (feat, new_vars["batch_stats"])
        return loss, aux

    def gen_loss(gen_params, reid_params, cols, batch, rng):
        params = {**gen_params, **jax.tree_util.tree_map(
            jax.lax.stop_gradient, reid_params)}
        variables = {"params": params, **cols}
        label1 = label2 = batch["label"]
        gray, ir = batch["gray"], batch["ir"]
        bs = label1.shape[0]

        def fwd(module):
            # person features for styles come from the frozen branch
            feat, _, _, _, _ = module.person_id(
                xRGB=batch["aug_rgb"], xIR=batch["aug_ir"], modal=0,
                with_feature=True, train=False)
            featV, featI = jnp.split(jax.lax.stop_gradient(feat), 2, axis=0)
            cyc = _cycle_forward(module, gray, ir, featV, featI)
            gray2ir, ir2gray = cyc[0], cyc[1]
            fZv, sZv, *_ = module.person_id(xZ=gray2ir, modal=3,
                                            with_feature=True, train=False)
            fZi, sZi, *_ = module.person_id(xZ=ir2gray, modal=3,
                                            with_feature=True, train=False)
            d_fake = module.discriminate(jnp.concatenate([fZv, fZi], 0))
            return cyc, featV, featI, (fZv, sZv), (fZi, sZi), d_fake

        (cyc, featV, featI, (featZ_v, scoreZ_v), (featZ_i, scoreZ_i),
         d_fake), new_vars = model.apply(
            variables, method=lambda m: fwd(m),
            mutable=["batch_stats", "vq_stats"], rngs={"dropout": rng})
        gray2ir, ir2gray, gray2ir2gray, ir2gray2ir, latent = cyc

        gray_target = jnp.mean(gray, axis=-1, keepdims=True).repeat(3, -1)
        ir_target = jnp.mean(ir, axis=-1, keepdims=True).repeat(3, -1)
        cycle = mse(ir2gray2ir, ir_target) + mse(gray2ir2gray, gray_target)
        loss_g = cycle + LATENT_LOSS_WEIGHT * latent

        loss_id_ir = (ce(scoreZ_v, label1) + ce(scoreZ_i, label2)) / 2
        # center-margin: translated centers closer than real cross-modal
        # centers by margin 0.01 (reference :283-299)
        n = bs // num_pos
        center = lambda f: f.reshape(n, num_pos, -1).mean(axis=1)
        pos = jnp.mean(jnp.square(center(featZ_v) - center(featZ_i)), axis=1)
        neg = jnp.mean(jnp.square(center(featV) - center(featI)), axis=1)
        margin_loss = jnp.mean(jnp.maximum(0.0, 0.01 + pos - neg))
        loss_feat_ir = margin_loss \
            + L.cross_triplet_loss(featZ_v, featZ_i, featZ_v, label1, label2, label1) \
            + L.cross_triplet_loss(featZ_i, featZ_v, featZ_i, label2, label1, label2)

        modal_fake = jnp.concatenate([2 * label1 + 1, 2 * label1], 0)
        disc_fake = ce(d_fake, modal_fake)

        total = loss_g + 0.5 * (loss_id_ir + loss_feat_ir + disc_fake)
        metrics = {"cycle": cycle, "latent": latent, "id_ir": loss_id_ir,
                   "feat_ir": loss_feat_ir, "disc_fake": disc_fake,
                   "loss_gen": total}
        return total, (metrics, new_vars, gray2ir, ir2gray)

    # Donate the state: params/opt/EMA buffers are rewritten in place,
    # halving peak HBM for the step (XLA aliases in->out buffers).
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: BiState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        r1, r2 = jax.random.split(rng)
        reid_params, gen_params = _split(state.params)
        cols = {"batch_stats": state.batch_stats, "vq_stats": state.vq_stats}

        # generator pass first to obtain the translated views for the
        # discriminator-real step (the reference interleaves these; one
        # extra forward keeps the dataflow acyclic under jit)
        (loss_g, (metrics, new_vars, inter_v, inter_i)), gen_grads = \
            jax.value_and_grad(gen_loss, has_aux=True)(
                gen_params, reid_params, cols, batch, r2)
        upd, opt_gen = tx_gen.update(gen_grads, state.opt_gen, gen_params)
        gen_params = optax.apply_updates(gen_params, upd)

        cols = {"batch_stats": new_vars["batch_stats"],
                "vq_stats": new_vars["vq_stats"]}
        (loss_re, (feat, batch_stats)), reid_grads = jax.value_and_grad(
            reid_loss, has_aux=True)(
            reid_params, gen_params, cols, batch,
            jax.lax.stop_gradient(inter_v), jax.lax.stop_gradient(inter_i), r1)
        upd, opt_reid = tx_reid.update(reid_grads, state.opt_reid, reid_params)
        reid_params = optax.apply_updates(reid_params, upd)

        metrics = {**metrics, "loss_reid": loss_re}
        return state.replace(
            step=state.step + 1, params={**gen_params, **reid_params},
            batch_stats=batch_stats, vq_stats=new_vars["vq_stats"],
            opt_reid=opt_reid, opt_gen=opt_gen), metrics

    return train_step


def train(args):
    mesh = par.default_mesh()
    dataset = SYSUData(args.path, part=False, seed=args.seed)
    loader_batch = args.batch_size * args.num_pos
    steps_per_epoch = max(len(dataset) // loader_batch, 1)
    total_steps = args.steps or steps_per_epoch * args.epoch

    model = ModelAdaptiveBi_Deep(class_num=dataset.num_class, arch=args.arch)
    tx_reid = optax.chain(
        optax.add_decayed_weights(5e-4),
        optax.sgd(learning_rate=reid_lr_schedule(args.lr_F, steps_per_epoch),
                  momentum=0.9, nesterov=True))
    tx_gen = optax.adam(args.lr)

    h, w = dataset.train_color_image.shape[1:3]
    probe = jnp.zeros((2 * args.num_pos, h, w, 3), jnp.float32)

    def init_probe(module):
        feat, _, f2d, _, f3 = module.person_id(xRGB=probe, xIR=probe, modal=0,
                                               with_feature=True)
        module.person_id(xZ=probe, modal=3)
        featV, featI = jnp.split(feat, 2, axis=0)
        cyc = _cycle_forward(module, probe, probe, featV, featI)
        return module.discriminate(feat)

    variables = model.init(
        {"params": jax.random.PRNGKey(args.seed),
         "dropout": jax.random.PRNGKey(1)}, method=init_probe)
    reid_params, gen_params = _split(variables["params"])
    state = BiState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                    batch_stats=variables.get("batch_stats", {}),
                    vq_stats=variables.get("vq_stats", {}),
                    opt_reid=tx_reid.init(reid_params),
                    opt_gen=tx_gen.init(gen_params))
    # checkpoint/resume with the sibling trainers' periodic/last layout
    # (reference saves the bi ensemble per epoch, train_vqvae_deep_bi.py)
    from vqvae2_tpu.utils.checkpoint import CheckpointManager

    if args.resume and args.ckpt_dir:
        mgr = CheckpointManager(args.ckpt_dir)
        state, name = mgr.restore_latest(state)
        if par.is_primary():
            print(f"resumed from {args.ckpt_dir}/{name}" if name else
                  f"no checkpoint in {args.ckpt_dir}; starting fresh",
                  flush=True)
    ckpt = (CheckpointManager(args.ckpt_dir, config=vars(args))
            if args.ckpt_dir else None)
    state = par.replicate(state, mesh)
    step_fn = make_train_step(model, tx_reid, tx_gen, args.num_pos)
    # hardware-RNG dropout stream (threefry bit generation is VPU-bound;
    # see train/pixelsnail.py)
    rng = jax.random.key(args.seed + 2, impl="unsafe_rbg")
    host_rng = np.random.default_rng(args.seed)

    from vqvae2_tpu.utils.metrics import CsvLogger

    csv = CsvLogger(args.metrics_csv)
    n_done, m, t0 = 0, {}, time.perf_counter()
    while n_done < total_steps:
        dataset.samplize(args.batch_size, args.num_pos)
        for rows in epoch_row_batches(dataset, loader_batch):
            rgb = np.stack([r[0] for r in rows])
            ir = np.stack([r[1] for r in rows])
            wmix = host_rng.random((len(rgb), 3)) + 0.01
            wmix /= wmix.sum(axis=1, keepdims=True)
            gray = np.repeat(np.einsum("bhwc,bc->bhw", rgb, wmix)[..., None],
                             3, axis=-1).astype(np.float32)
            batch = par.shard_batch({
                "rgb": rgb, "ir": ir, "gray": gray,
                "aug_rgb": aug_transforms(rgb, host_rng),
                "aug_ir": aug_transforms(ir, host_rng),
                "label": np.asarray([r[2] for r in rows], np.int32),
            }, mesh)
            state, metrics = step_fn(state, batch, rng)
            n_done += 1
            if n_done % args.log_every == 0 and par.is_primary():
                m = par.reduce_dict(metrics)
                print(f"step {n_done}/{total_steps} gen {m['loss_gen']:.3f} "
                      f"reid {m['loss_reid']:.3f} cycle {m['cycle']:.4f} "
                      f"latent {m['latent']:.4f}", flush=True)
                csv.log(n_done, m)
            if ckpt and args.save_every and n_done % args.save_every == 0:
                ckpt.save_periodic(n_done, state)
            if n_done >= total_steps:
                break
    if ckpt:
        ckpt.save_last(state)
    return m


def build_argparser():
    p = argparse.ArgumentParser(description="Bidirectional cycle trainer (TPU)")
    p.add_argument("--path", type=str, default="")
    p.add_argument("--epoch", type=int, default=200)
    p.add_argument("--steps", type=int, default=0)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--num_pos", type=int, default=4)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--lr_F", type=float, default=0.1)
    p.add_argument("--arch", type=str, default="resnet18")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--ckpt_dir", type=str, default="",
                   help="periodic/last checkpoints (off if empty)")
    p.add_argument("--save_every", type=int, default=0,
                   help="periodic checkpoint cadence in steps (0 = last only)")
    p.add_argument("--resume", action="store_true",
                   help="restore the latest step_*/last checkpoint from --ckpt_dir")
    p.add_argument("--metrics_csv", type=str, default="",
                   help="append per-log-step scalars to this CSV (loss curves)")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if args.synthetic:
        import tempfile

        from vqvae2_tpu.train.reid import make_synthetic_sysu

        args.path = make_synthetic_sysu(tempfile.mkdtemp(prefix="sysu_syn_"),
                                        h=96, w=48)
    return par.launch(train, args)


if __name__ == "__main__":
    main()
