"""Gray→color adaptation trainer — TPU rebuild of reference
``train_gray2color.py`` (``:27-130``): ModelAdaptive with the style-encoder
branch (no ReID gradient), Non-local fusion of IR/gray content with style
features, and recon + content-consistency + 0.25·latent losses.

The "other" pairing draws a different instance of the same identity per
anchor (reference ``:64-70``) — here a per-identity random rotation of the
K instances, computed host-side per step.
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

from vqvae2_tpu import parallel as par
from vqvae2_tpu.data.datasets import epoch_row_batches
from vqvae2_tpu.data.sysu import SYSUData
from vqvae2_tpu.models.adaptive import ModelAdaptive
from vqvae2_tpu.utils import schedules

LATENT_LOSS_WEIGHT = 0.25


class G2CState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    vq_stats: Any
    opt_state: Any


def _forward(module: ModelAdaptive, img1, img2, ids):
    """Whole generator pass in one module scope (reference ``:58-117``)."""
    feat2d = module.encode_style(img1)
    feat2d_other = module.encode_style(img1[ids])

    gray = img2  # reference overrides the random mix with the IR view (:90)

    rgb_content, latent_loss = module.encode_content(img1, train=True)
    rgb_reconst = module.decode(rgb_content)

    gray_content, _ = module.encode_content(gray, train=True)
    gray_itself = module.fuse(gray_content, feat2d, train=True)
    rgb_fake = module.decode(gray_itself)
    gray_other = module.fuse(gray_content, feat2d_other, train=True)
    rgb_fake_other = module.decode(gray_other)

    return (rgb_content, rgb_reconst, gray_itself, gray_other, rgb_fake,
            rgb_fake_other, latent_loss)


def make_train_step(model: ModelAdaptive, tx):
    def loss_fn(params, cols, batch, ids, rng):
        outs, new_vars = model.apply(
            {"params": params, **cols}, batch["rgb"], batch["ir"], ids,
            method=_forward, mutable=["batch_stats", "vq_stats"],
            rngs={"dropout": rng})
        (rgb_content, rgb_reconst, gray_itself, gray_other, rgb_fake,
         rgb_fake_other, latent) = outs
        img1 = batch["rgb"]
        mse = lambda a, b: jnp.mean(jnp.square(a - b))
        recon = mse(rgb_reconst, img1) + mse(rgb_fake, img1) \
            + mse(rgb_fake_other, img1)
        recon_feat = mse(gray_itself, rgb_content) + mse(gray_other, rgb_content)
        loss = recon_feat + recon + LATENT_LOSS_WEIGHT * latent
        return loss, ({"loss": loss, "recon": recon, "recon_feat": recon_feat,
                       "latent": latent}, new_vars,
                      (rgb_reconst, rgb_fake, rgb_fake_other))

    # Donate the state: params/opt/EMA buffers are rewritten in place,
    # halving peak HBM for the step (XLA aliases in->out buffers).
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: G2CState, batch, ids, rng):
        rng = jax.random.fold_in(rng, state.step)
        cols = {"batch_stats": state.batch_stats, "vq_stats": state.vq_stats}
        (loss, (metrics, new_vars, images)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, cols, batch, ids, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(
            step=state.step + 1, params=params,
            batch_stats=new_vars["batch_stats"], vq_stats=new_vars["vq_stats"],
            opt_state=opt_state), (metrics, images)

    return train_step


def other_instance_ids(batch_ids: int, num_pos: int,
                       rng: np.random.Generator) -> np.ndarray:
    """Reference ``:64-70``: rotate each identity's K instances by a random
    nonzero offset."""
    l = (np.arange(batch_ids) * num_pos)[:, None]
    r = rng.integers(1, num_pos, size=(batch_ids, 1))
    ids = (np.tile(np.arange(num_pos), batch_ids).reshape(-1, num_pos) + r) \
        % num_pos + l
    return ids.reshape(-1)


def _init_probe(module: ModelAdaptive, img):
    s = module.encode_style(img)
    content, diff = module.encode_content(img)
    fused = module.fuse(content, s)
    dec = module.decode(fused)
    feat = module.encode_person(img)
    return dec


def train(args):
    mesh = par.default_mesh()
    dataset = SYSUData(args.path, part=False, seed=args.seed)
    loader_batch = args.batch_size * args.num_pos
    steps_per_epoch = max(len(dataset) // loader_batch, 1)
    total_steps = args.steps or steps_per_epoch * args.epoch

    model = ModelAdaptive(class_num=dataset.num_class, arch=args.arch)
    tx = (schedules.cycle_adam(args.lr, total_steps)
          if args.sched == "cycle" else optax.adam(args.lr))

    h, w = dataset.train_color_image.shape[1:3]
    variables = model.init(
        {"params": jax.random.PRNGKey(args.seed),
         "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((2, h, w, 3), jnp.float32), method=_init_probe)
    state = G2CState(step=jnp.zeros((), jnp.int32),
                     params=variables["params"],
                     batch_stats=variables.get("batch_stats", {}),
                     vq_stats=variables.get("vq_stats", {}),
                     opt_state=tx.init(variables["params"]))
    # checkpoint/resume with the sibling trainers' periodic/last layout
    # (the reference saves per epoch, train_gray2color.py epoch loop)
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
    step_fn = make_train_step(model, tx)
    # hardware-RNG dropout stream (threefry bit generation is VPU-bound;
    # see train/pixelsnail.py)
    rng = jax.random.key(args.seed + 2, impl="unsafe_rbg")
    host_rng = np.random.default_rng(args.seed)

    from vqvae2_tpu.utils.metrics import CsvLogger

    csv = CsvLogger(args.metrics_csv)
    n_done, m = 0, {}
    t0 = time.perf_counter()
    while n_done < total_steps:
        dataset.samplize(args.batch_size, args.num_pos)
        for rows in epoch_row_batches(dataset, loader_batch):
            imgs1 = np.stack([r[0] for r in rows])
            imgs2 = np.stack([r[1] for r in rows])
            batch = par.shard_batch({"rgb": imgs1, "ir": imgs2}, mesh)
            ids = jnp.asarray(other_instance_ids(args.batch_size, args.num_pos,
                                                 host_rng))
            state, (metrics, images) = step_fn(state, batch, ids, rng)
            n_done += 1
            if n_done % args.log_every == 0 and par.is_primary():
                m = par.reduce_dict(metrics)
                rate = n_done * loader_batch / (time.perf_counter() - t0)
                print(f"step {n_done}/{total_steps} loss {m['loss']:.4f} "
                      f"recon {m['recon']:.4f} latent {m['latent']:.4f} "
                      f"({rate:.1f} img/s)", flush=True)
                csv.log(n_done, dict(m, img_per_s=rate))
            if args.sample_every and n_done % args.sample_every == 0 \
                    and par.is_primary():
                # grid: rgb | ir | rgb recon | colorized | colorized w/ the
                # other instance's style (reference train_gray2color.py's
                # per-epoch dump of reconst/fake/fake2)
                from vqvae2_tpu.utils.image import save_image

                rec, fake, fake2 = (np.asarray(x) for x in images)
                k = min(8, len(imgs1))
                grid = np.concatenate([imgs1[:k], imgs2[:k], rec[:k],
                                       fake[:k], fake2[:k]], axis=0)
                save_image(grid, f"{args.sample_dir}/{n_done:05d}.png", nrow=k,
                           value_range=(-2.0, 2.0))
            if ckpt and args.save_every and n_done % args.save_every == 0:
                ckpt.save_periodic(n_done, state)
            if n_done >= total_steps:
                break
    if ckpt:
        ckpt.save_last(state)
    return m


def build_argparser():
    p = argparse.ArgumentParser(description="Gray->color adaptation trainer (TPU)")
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
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--sample_dir", type=str, default="sample")
    p.add_argument("--sample_every", type=int, default=0,
                   help="dump [rgb|ir|recon|colorized|colorized-other] grids"
                        " every N steps (0 = off)")
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
