"""ModelAdaptive trainer — TPU rebuild of the fork's ``train_vqvae.py``
(``:27-143``; despite its name it trains the VQ-VAE adaptor + ReID net
jointly on SYSU-MM01, not plain stage-1 — the plain stage-1 lives at
:mod:`vqvae2_tpu.train.vqvae`).

Per batch: **ReID step** (Adam #1) on the IR view — id CE + batch-hard
triplet + within-identity feature variance (``:56-66``); then **generator
step** (Adam #2) with the ReID net frozen — VQ-VAE forward with the IR head
(``rgb_fake, latent, ir_fake``), fake-IR identity CE, 100× KL distillation of
fake-IR scores toward the real-IR scores, per-identity mean-feature MSE, and
recon + 0.25·latent losses (``:70-88``).  Metric aggregation is a plain
jit-level reduction (the reference pickles dicts through ``all_gather``,
``:95-100``).
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
from vqvae2_tpu.models.adaptive import ModelAdaptive
from vqvae2_tpu.utils import schedules
from vqvae2_tpu.utils.checkpoint import CheckpointManager
from vqvae2_tpu.utils.image import save_image

LATENT_LOSS_WEIGHT = 0.25


class AdaptiveState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    vq_stats: Any
    opt_reid: Any
    opt_gen: Any


def _split(params):
    reid = {"person_id": params["person_id"]}
    gen = {k: v for k, v in params.items() if k != "person_id"}
    return reid, gen


def make_train_step(model: ModelAdaptive, tx_reid, tx_gen, num_pos: int):
    ce = lambda lg, lb: optax.softmax_cross_entropy_with_integer_labels(
        lg, lb).mean()

    def reid_loss(reid_params, gen_params, cols, batch, rng):
        params = {**gen_params, **reid_params}

        def fwd(m):
            return m.person_id(xIR=batch["ir"], modal=2, train=True)

        (feat, score), new_vars = model.apply(
            {"params": params, **cols}, method=lambda m: fwd(m),
            mutable=["batch_stats"], rngs={"dropout": rng})
        label2 = batch["label"]
        loss_id = ce(score, label2)
        loss_tri, _ = L.triplet_loss(feat, label2)
        n = label2.shape[0] // num_pos
        grp = feat.reshape(n, num_pos, -1)
        loss = loss_id + loss_tri + grp.var(axis=1).mean()
        return loss, (grp.mean(axis=1), score, new_vars["batch_stats"])

    def gen_loss(gen_params, reid_params, cols, batch, mean_feat, score_real,
                 rng):
        params = {**gen_params, **jax.tree_util.tree_map(
            jax.lax.stop_gradient, reid_params)}
        img1, img2, label2 = batch["rgb"], batch["ir"], batch["label"]

        def fwd(m):
            rgb_fake, latent, ir_fake = m.adaptor.forward_ir(img1, train=True)
            ir3 = jnp.repeat(ir_fake, 3, axis=-1)
            # frozen pass: with_feature=True keeps the (feat, score) return
            # regardless of BN mode (the reference only cuts grads, :73)
            feat_fake, score_fake, *_ = m.person_id(
                xIR=ir3, modal=2, with_feature=True, train=False)
            return rgb_fake, latent, ir_fake, feat_fake, score_fake

        (rgb_fake, latent, ir_fake, feat_fake, score_fake), new_vars = \
            model.apply({"params": params, **cols}, method=lambda m: fwd(m),
                        mutable=["batch_stats", "vq_stats"],
                        rngs={"dropout": rng})

        n = label2.shape[0] // num_pos
        mean_fake = feat_fake.reshape(n, num_pos, -1).mean(axis=1)
        loss_id_fake = ce(score_fake, label2)
        # 100·KL(fake ‖ sg(real)) (reference :78)
        logp = jax.nn.log_softmax(score_fake, axis=-1)
        q = jax.nn.softmax(jax.lax.stop_gradient(score_real), axis=-1)
        # torch kl_div(log_input, target) with default 'mean' divides by numel
        loss_kl = 100.0 * jnp.mean(q * (jnp.log(jnp.clip(q, 1e-12, None)) - logp))
        feat_loss = jnp.mean(jnp.square(
            jax.lax.stop_gradient(mean_feat) - mean_fake))
        recon = jnp.mean(jnp.square(rgb_fake - img1))
        loss = recon + LATENT_LOSS_WEIGHT * latent + loss_id_fake \
            + feat_loss + loss_kl
        metrics = {"mse": recon, "latent": latent, "id_fake": loss_id_fake,
                   "kl_fake": loss_kl, "feat": feat_loss, "loss_gen": loss}
        return loss, (metrics, new_vars, rgb_fake, ir_fake)

    # Donate the state: params/opt/EMA buffers are rewritten in place,
    # halving peak HBM for the step (XLA aliases in->out buffers).
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: AdaptiveState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        r1, r2 = jax.random.split(rng)
        reid_params, gen_params = _split(state.params)
        cols = {"batch_stats": state.batch_stats, "vq_stats": state.vq_stats}

        (loss_re, (mean_feat, score_real, batch_stats)), rgrads = \
            jax.value_and_grad(reid_loss, has_aux=True)(
                reid_params, gen_params, cols, batch, r1)
        upd, opt_reid = tx_reid.update(rgrads, state.opt_reid, reid_params)
        reid_params = optax.apply_updates(reid_params, upd)

        cols = {"batch_stats": batch_stats, "vq_stats": state.vq_stats}
        (loss_g, (metrics, new_vars, rgb_fake, ir_fake)), ggrads = \
            jax.value_and_grad(gen_loss, has_aux=True)(
                gen_params, reid_params, cols, batch,
                jax.lax.stop_gradient(mean_feat),
                jax.lax.stop_gradient(score_real), r2)
        upd, opt_gen = tx_gen.update(ggrads, state.opt_gen, gen_params)
        gen_params = optax.apply_updates(gen_params, upd)

        metrics = {**metrics, "loss_reid": loss_re}
        return state.replace(
            step=state.step + 1, params={**gen_params, **reid_params},
            batch_stats=new_vars["batch_stats"], vq_stats=new_vars["vq_stats"],
            opt_reid=opt_reid, opt_gen=opt_gen), (metrics, rgb_fake, ir_fake)

    return train_step


def _init_probe(module: ModelAdaptive, img):
    # with_feature=True reaches the classifier/bottleneck at init
    module.person_id(xIR=img, modal=2, with_feature=True)
    out = module.adaptor.forward_ir(img)
    s = module.encode_style(img)
    content, _ = module.encode_content(img)
    module.decode(module.fuse(content, s))
    return out[0]


def train(args):
    mesh = par.default_mesh()
    dataset = SYSUData(args.path, part=False, seed=args.seed)
    loader_batch = args.batch_size * args.num_pos
    steps_per_epoch = max(len(dataset) // loader_batch, 1)
    total_steps = args.steps or steps_per_epoch * args.epoch

    model = ModelAdaptive(class_num=dataset.num_class, arch=args.arch)
    tx_reid = optax.adam(args.lr)
    tx_gen = (schedules.cycle_adam(args.lr, total_steps)
              if args.sched == "cycle" else optax.adam(args.lr))

    h, w = dataset.train_color_image.shape[1:3]
    variables = model.init(
        {"params": jax.random.PRNGKey(args.seed),
         "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((2, h, w, 3), jnp.float32), method=_init_probe)
    reid_params, gen_params = _split(variables["params"])
    state = AdaptiveState(step=jnp.zeros((), jnp.int32),
                          params=variables["params"],
                          batch_stats=variables.get("batch_stats", {}),
                          vq_stats=variables.get("vq_stats", {}),
                          opt_reid=tx_reid.init(reid_params),
                          opt_gen=tx_gen.init(gen_params))
    state = par.replicate(state, mesh)
    step_fn = make_train_step(model, tx_reid, tx_gen, args.num_pos)
    # hardware-RNG dropout stream (threefry bit generation is VPU-bound;
    # see train/pixelsnail.py)
    rng = jax.random.key(args.seed + 2, impl="unsafe_rbg")

    ckpt = CheckpointManager(args.ckpt_dir, config=vars(args)) if args.ckpt_dir else None
    from vqvae2_tpu.utils.metrics import CsvLogger

    csv = CsvLogger(args.metrics_csv)
    n_done, m, t0 = 0, {}, time.perf_counter()
    while n_done < total_steps:
        dataset.samplize(args.batch_size, args.num_pos)
        for rows in epoch_row_batches(dataset, loader_batch):
            imgs1 = np.stack([r[0] for r in rows])
            imgs2 = np.stack([r[1] for r in rows])
            batch = par.shard_batch({
                "rgb": imgs1, "ir": imgs2,
                "label": np.asarray([r[2] for r in rows], np.int32),
            }, mesh)
            state, (metrics, rgb_fake, ir_fake) = step_fn(state, batch, rng)
            n_done += 1
            if n_done % args.log_every == 0 and par.is_primary():
                m = par.reduce_dict(metrics)
                rate = n_done * loader_batch / (time.perf_counter() - t0)
                print(f"step {n_done}/{total_steps} mse {m['mse']:.5f} "
                      f"lat {m['latent']:.3f} id_fake {m['id_fake']:.3f} "
                      f"reid {m['loss_reid']:.3f} ({rate:.1f} img/s)",
                      flush=True)
                csv.log(n_done, dict(m, img_per_s=rate))
            if args.sample_every and n_done % args.sample_every == 0 \
                    and par.is_primary():
                # sample grid: rgb | fake rgb | real ir | fake ir (:125-140)
                k = min(8, len(imgs1))
                grid = np.concatenate([
                    imgs1[:k], np.asarray(rgb_fake)[:k], imgs2[:k],
                    np.repeat(np.asarray(ir_fake)[:k], 3, -1)], axis=0)
                save_image(grid, f"{args.sample_dir}/{n_done:05d}.png", nrow=k,
                           value_range=(-2.0, 2.0))
            if ckpt and n_done % (steps_per_epoch * 10) == 0:
                ckpt.save_periodic(n_done, state)
            if n_done >= total_steps:
                break
    if ckpt:
        ckpt.save_last(state)
    return m


def build_argparser():
    p = argparse.ArgumentParser(
        description="ModelAdaptive (VQ-VAE + ReID) trainer (TPU)")
    p.add_argument("--path", type=str, default="")
    p.add_argument("--epoch", type=int, default=560)
    p.add_argument("--steps", type=int, default=0)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--num_pos", type=int, default=4)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--sched", type=str, default="")
    p.add_argument("--arch", type=str, default="resnet18")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--ckpt_dir", type=str, default="")
    p.add_argument("--sample_dir", type=str, default="sample")
    p.add_argument("--sample_every", type=int, default=0)
    p.add_argument("--log_every", type=int, default=10)
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
