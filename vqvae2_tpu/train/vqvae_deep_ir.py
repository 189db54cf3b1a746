"""Single-direction gray→IR trainer with staged curriculum — TPU rebuild of
reference ``train_vqvae_deep_ir.py``.

Curriculum (reference ``:36,195-320``): the first ``stage_reconstruction``
(40) epochs run pure IR reconstruction (``train_joint``, ``:98-130``:
encode/quantize/decode IR, MSE against the channel-mean IR + 0.25·latent);
after that each batch runs the full phase: random-channel gray fused with RGB
person features → `inter` (fake IR), ReID step (id CE over V/T/Z scores,
cross-triplets against the translation, modal-free MSE, discriminator real
CE over 2·class modality labels), then a frozen-reid generator step with the
translated-view id loss, feature-center alignment
(``centerG ↔ (centerV+centerT)/2``, ``:271-288``) and discriminator fake CE.

Two jitted step functions; the host dispatches on epoch.
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
from vqvae2_tpu.models.adaptive import ModelAdaptive_Deep
from vqvae2_tpu.train.vqvae_deep import DeepState, _split_params
from vqvae2_tpu.train.vqvae_deep_bi import aug_transforms

LATENT_LOSS_WEIGHT = 0.25
STAGE_RECONSTRUCTION = 40  # epochs (reference :36)


def _e3(x):
    return jnp.repeat(x, 3, axis=-1) if x.shape[-1] == 1 else x


def make_recon_step(model: ModelAdaptive_Deep, tx_gen, feat_dim: int):
    """Stage-1 pure reconstruction (reference ``train_joint``, :98-130).
    The style decoder needs a style vector (the reference's style-less decode
    calls are inconsistent with its own decoder API); the recon stage feeds a
    zero style."""

    def loss_fn(gen_params, reid_params, cols, ir, rng):
        params = {**gen_params, **jax.tree_util.tree_map(
            jax.lax.stop_gradient, reid_params)}
        zero_style = jnp.zeros((ir.shape[0], feat_dim), ir.dtype)

        def fwd(m):
            b, t = m.encode_content(ir)
            content, latent = m.quantize_content(b, t, train=True)
            return _e3(m.decode(content, zero_style)), latent

        (rec, latent), new_vars = model.apply(
            {"params": params, **cols}, method=lambda m: fwd(m),
            mutable=["batch_stats", "vq_stats"], rngs={"dropout": rng})
        target = jnp.mean(ir, -1, keepdims=True).repeat(3, -1)
        recon = jnp.mean(jnp.square(rec - target))
        loss = recon + LATENT_LOSS_WEIGHT * latent
        return loss, ({"recon": recon, "latent": latent, "loss_gen": loss,
                       "loss_reid": jnp.zeros(())}, new_vars)

    # Donate the state: params/opt/EMA buffers are rewritten in place,
    # halving peak HBM for the step (XLA aliases in->out buffers).
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: DeepState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        reid_params, gen_params = _split_params(state.params)
        cols = {"batch_stats": state.batch_stats, "vq_stats": state.vq_stats}
        (loss, (metrics, new_vars)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(gen_params, reid_params, cols,
                                   batch["ir"], rng)
        upd, opt_gen = tx_gen.update(grads, state.opt_gen, gen_params)
        gen_params = optax.apply_updates(gen_params, upd)
        return state.replace(
            step=state.step + 1, params={**gen_params, **reid_params},
            batch_stats=new_vars["batch_stats"], vq_stats=new_vars["vq_stats"],
            opt_gen=opt_gen), metrics

    return step


def make_full_step(model: ModelAdaptive_Deep, tx_reid, tx_gen, num_pos: int):
    ce = lambda lg, lb: optax.softmax_cross_entropy_with_integer_labels(
        lg, lb).mean()
    mse = lambda a, b: jnp.mean(jnp.square(a - b))

    def gen_inter(params, cols, gray, aug_rgb, rng):
        """gray fused with RGB person features → inter (fake IR)."""

        def fwd(m):
            featV, scoreV, feat2dV, actV, f3V = m.person_id(
                xRGB=aug_rgb, modal=1, with_feature=True, train=True)
            b, t = m.encode_content(gray)
            bf, tf = m.fuse(b, t, f3V, feat2dV, train=True)
            content, latent = m.quantize_content(bf, tf, train=True)
            inter = _e3(m.decode(content, jax.lax.stop_gradient(featV)))
            return inter, latent, featV, scoreV

        return model.apply({"params": params, **cols}, method=lambda m: fwd(m),
                           mutable=["batch_stats", "vq_stats"],
                           rngs={"dropout": rng})

    def reid_loss(reid_params, gen_params, cols, batch, inter, featV, scoreV,
                  rng):
        params = {**gen_params, **reid_params}
        label1 = label2 = batch["label"]

        def fwd(m):
            fT, sT = m.person_id(xIR=batch["aug_ir"], modal=2, train=True)
            fZ, sZ = m.person_id(xZ=inter, modal=3, train=True)
            d = m.discriminate(jnp.concatenate(
                [jax.lax.stop_gradient(featV), jax.lax.stop_gradient(fT),
                 jax.lax.stop_gradient(fZ)], 0))
            return fT, sT, fZ, sZ, d

        (featT, scoreT, featZ, scoreZ, d_real), new_vars = model.apply(
            {"params": params, **cols}, method=lambda m: fwd(m),
            mutable=["batch_stats"], rngs={"dropout": rng})

        labels = jnp.concatenate([label1, label2, label1], 0)
        loss_id = ce(jnp.concatenate([scoreV, scoreT, scoreZ], 0), labels)
        loss_tri = (L.cross_triplet_loss(featV, featZ, featV, label1, label1, label1)
                    + L.cross_triplet_loss(featT, featZ, featT, label2, label1, label2)
                    + L.cross_triplet_loss(featZ, featT, featZ, label2, label1, label2))
        modal_free = mse(featZ, jax.lax.stop_gradient(featV))
        modal_true = jnp.concatenate([2 * label1, 2 * label2 + 1, 2 * label1], 0)
        disc_true = ce(d_real, modal_true)
        loss = loss_id + loss_tri + modal_free + disc_true
        return loss, (featT, new_vars["batch_stats"])

    def gen_loss(gen_params, reid_params, cols, batch, featV, featT, rng):
        params = {**gen_params, **jax.tree_util.tree_map(
            jax.lax.stop_gradient, reid_params)}
        label1 = batch["label"]
        gray, aug_rgb = batch["gray"], batch["aug_rgb"]

        def fwd(m):
            fV, _, feat2dV, _, f3V = m.person_id(
                xRGB=aug_rgb, modal=1, with_feature=True, train=False)
            b, t = m.encode_content(gray)
            bf, tf = m.fuse(b, t, f3V, feat2dV, train=True)
            content, latent = m.quantize_content(bf, tf, train=True)
            inter = _e3(m.decode(content, jax.lax.stop_gradient(fV)))
            featG, score, *_ = m.person_id(xIR=inter, modal=2,
                                           with_feature=True, train=False)
            d_fake = m.discriminate(featG)
            return inter, latent, featG, score, d_fake

        (inter, latent, featG, score, d_fake), new_vars = model.apply(
            {"params": params, **cols}, method=lambda m: fwd(m),
            mutable=["batch_stats", "vq_stats"], rngs={"dropout": rng})

        loss_id_ir = ce(score, label1)
        n = label1.shape[0] // num_pos
        grp = lambda f: f.reshape(n, num_pos, -1)
        FV, FG = grp(jax.lax.stop_gradient(featV)), grp(featG)
        centerT = grp(jax.lax.stop_gradient(featT)).mean(axis=1)
        centerV, centerG = FV.mean(axis=1), FG.mean(axis=1)
        # feature-center alignment (reference :271-288)
        loss_feat_ir = mse(centerG, (centerV + centerT) / 2)
        modal_fake = 2 * label1 + 1
        disc_fake = ce(d_fake, modal_fake)

        loss = 0.1 * (loss_id_ir + loss_feat_ir + disc_fake) \
            + LATENT_LOSS_WEIGHT * latent
        metrics = {"latent": latent, "id_ir": loss_id_ir,
                   "feat_ir": loss_feat_ir, "disc_fake": disc_fake,
                   "loss_gen": loss, "recon": jnp.zeros(())}
        return loss, (metrics, new_vars)

    # Donate the state: params/opt/EMA buffers are rewritten in place,
    # halving peak HBM for the step (XLA aliases in->out buffers).
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: DeepState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        r0, r1, r2 = jax.random.split(rng, 3)
        reid_params, gen_params = _split_params(state.params)
        cols = {"batch_stats": state.batch_stats, "vq_stats": state.vq_stats}

        params_all = {**gen_params, **reid_params}
        (inter, latent0, featV, scoreV), nv = gen_inter(
            params_all, cols, batch["gray"], batch["aug_rgb"], r0)
        cols = {"batch_stats": nv["batch_stats"], "vq_stats": nv["vq_stats"]}

        (loss_re, (featT, batch_stats)), reid_grads = jax.value_and_grad(
            reid_loss, has_aux=True)(
            reid_params, gen_params, cols, batch,
            jax.lax.stop_gradient(inter), jax.lax.stop_gradient(featV),
            jax.lax.stop_gradient(scoreV), r1)
        upd, opt_reid = tx_reid.update(reid_grads, state.opt_reid, reid_params)
        reid_params = optax.apply_updates(reid_params, upd)

        cols = {"batch_stats": batch_stats, "vq_stats": cols["vq_stats"]}
        (loss_g, (metrics, new_vars)), gen_grads = jax.value_and_grad(
            gen_loss, has_aux=True)(
            gen_params, reid_params, cols, batch,
            jax.lax.stop_gradient(featV), jax.lax.stop_gradient(featT), r2)
        upd, opt_gen = tx_gen.update(gen_grads, state.opt_gen, gen_params)
        gen_params = optax.apply_updates(gen_params, upd)

        metrics = {**metrics, "loss_reid": loss_re}
        return state.replace(
            step=state.step + 1, params={**gen_params, **reid_params},
            batch_stats=new_vars["batch_stats"], vq_stats=new_vars["vq_stats"],
            opt_reid=opt_reid, opt_gen=opt_gen), metrics

    return step


def make_sample_fn(model: ModelAdaptive_Deep, feat_dim: int):
    """Eval-mode pass producing the tensors the reference saves at
    ``train_vqvae_deep_ir.py:344-360``: the gray→IR translation (``inter``)
    and the plain IR reconstruction."""

    @jax.jit
    def sample(params, batch_stats, vq_stats, batch):
        variables = {"params": params, "batch_stats": batch_stats,
                     "vq_stats": vq_stats}

        def fwd(m):
            featV, _, feat2dV, _, f3V = m.person_id(
                xRGB=batch["aug_rgb"], modal=1, with_feature=True, train=False)
            b, t = m.encode_content(batch["gray"])
            bf, tf = m.fuse(b, t, f3V, feat2dV, train=False)
            content, _ = m.quantize_content(bf, tf, train=False)
            inter = _e3(m.decode(content, featV))

            ir = batch["ir"]
            b2, t2 = m.encode_content(ir)
            c2, _ = m.quantize_content(b2, t2, train=False)
            zero_style = jnp.zeros((ir.shape[0], feat_dim), ir.dtype)
            ir_rec = _e3(m.decode(c2, zero_style))
            return inter, ir_rec

        return model.apply(variables, method=lambda m: fwd(m))

    return sample


def dump_samples(sample_fn, state: DeepState, batch, path: str,
                 max_rows: int = 8) -> None:
    """Grid rows = [aug RGB, gray, gray→IR, real IR, IR recon] — the layout of
    reference ``train_vqvae_deep_ir.py:354-360``."""
    from vqvae2_tpu.utils.image import save_image

    inter, ir_rec = sample_fn(state.params, state.batch_stats,
                              state.vq_stats, batch)
    k = min(int(batch["ir"].shape[0]), max_rows)
    take = lambda x: np.asarray(x)[:k]
    grid = np.concatenate([take(batch["aug_rgb"]), take(batch["gray"]),
                           take(inter), take(batch["ir"]), take(ir_rec)],
                          axis=0)
    save_image(grid, path, nrow=k)


def train(args):
    mesh = par.default_mesh()
    dataset = SYSUData(args.path, part=False, seed=args.seed)
    loader_batch = args.batch_size * args.num_pos
    steps_per_epoch = max(len(dataset) // loader_batch, 1)
    total_steps = args.steps or steps_per_epoch * args.epoch

    model = ModelAdaptive_Deep(class_num=dataset.num_class, arch=args.arch)
    tx_reid = optax.adam(args.lr_reid)
    tx_gen = optax.adam(args.lr)

    h, w = dataset.train_color_image.shape[1:3]
    probe = jnp.zeros((2, h, w, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(args.seed),
         "dropout": jax.random.PRNGKey(1)}, probe, method=model.init_probe)
    reid_params, gen_params = _split_params(variables["params"])
    state = DeepState(step=jnp.zeros((), jnp.int32),
                      params=variables["params"],
                      batch_stats=variables.get("batch_stats", {}),
                      vq_stats=variables.get("vq_stats", {}),
                      opt_reid=tx_reid.init(reid_params),
                      opt_gen=tx_gen.init(gen_params))
    # checkpoint/resume with the sibling trainers' periodic/last layout
    # (the reference saves per epoch, train_vqvae_deep_ir.py epoch loop).
    # NOTE on resume across the curriculum: the stage is derived from
    # n_done, which restarts at 0 — resume re-runs the recon stage unless
    # --stage_reconstruction is lowered accordingly.
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
    from vqvae2_tpu.models.resnet import pool_dim

    recon_step = make_recon_step(model, tx_gen, pool_dim(args.arch))
    full_step = make_full_step(model, tx_reid, tx_gen, args.num_pos)
    sample_fn = (make_sample_fn(model, pool_dim(args.arch))
                 if args.sample_dir else None)
    # hardware-RNG dropout stream (threefry bit generation is VPU-bound;
    # see train/pixelsnail.py)
    rng = jax.random.key(args.seed + 2, impl="unsafe_rbg")
    host_rng = np.random.default_rng(args.seed)

    stage_steps = (args.stage_reconstruction
                   if args.steps else args.stage_reconstruction * steps_per_epoch)
    from vqvae2_tpu.utils.metrics import CsvLogger

    csv = CsvLogger(args.metrics_csv)
    n_done, m = 0, {}
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
                "ir": ir, "gray": gray,
                "aug_rgb": aug_transforms(rgb, host_rng),
                "aug_ir": aug_transforms(ir, host_rng),
                "label": np.asarray([r[2] for r in rows], np.int32),
            }, mesh)
            fn = recon_step if n_done < stage_steps else full_step
            state, metrics = fn(state, batch, rng)
            n_done += 1
            if n_done % args.log_every == 0 and par.is_primary():
                m = par.reduce_dict(metrics)
                stage = "recon" if n_done <= stage_steps else "full"
                print(f"step {n_done}/{total_steps} [{stage}] "
                      f"gen {m['loss_gen']:.3f} reid {m['loss_reid']:.3f} "
                      f"latent {m['latent']:.4f}", flush=True)
                csv.log(n_done, m)
            if (sample_fn is not None and n_done % args.sample_every == 0
                    and par.is_primary()):
                dump_samples(sample_fn, state, batch,
                             f"{args.sample_dir}/{n_done:05d}.png")
            if ckpt and args.save_every and n_done % args.save_every == 0:
                ckpt.save_periodic(n_done, state)
            if n_done >= total_steps:
                break
    if ckpt:
        ckpt.save_last(state)
    return m


def build_argparser():
    p = argparse.ArgumentParser(description="Gray->IR staged trainer (TPU)")
    p.add_argument("--path", type=str, default="")
    p.add_argument("--epoch", type=int, default=200)
    p.add_argument("--steps", type=int, default=0)
    p.add_argument("--stage_reconstruction", type=int, default=STAGE_RECONSTRUCTION)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--num_pos", type=int, default=4)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--lr_reid", type=float, default=3e-4)
    p.add_argument("--arch", type=str, default="resnet18")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--sample_dir", type=str, default="",
                   help="dump sample grids here (reference sample-new/)")
    p.add_argument("--sample_every", type=int, default=500)
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
