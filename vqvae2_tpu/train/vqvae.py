"""Stage-1 VQ-VAE-2 trainer — TPU-native rebuild of the canonical stage-1 loop
(the README workflow of the reference, ``README.md:22-27``: MSE reconstruction
+ 0.25·latent loss per ``train_vqvae.py:34,85``, Adam lr 3e-4, optional
1-cycle schedule ``train_vqvae.py:187-195``).

TPU design: one jitted ``train_step`` carries forward, loss, grads, optimizer
update, and the VQ codebook EMA in a single compiled program; the global batch
is sharded over the ``data`` mesh axis, so GSPMD inserts the gradient
all-reduce (DDP equivalent) *and* the EMA-stat all-reduce
(reference ``vqvae.py:58-59``) automatically.

Run: ``python -m vqvae2_tpu.train.vqvae <img_dir> [flags]`` or
``--synthetic`` for a datasets-free smoke run.
"""

from __future__ import annotations

import argparse
import functools
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from vqvae2_tpu import parallel as par
from vqvae2_tpu.data.datasets import (ImageFileDataset, SyntheticImages,
                                      iterate_batches, normalize_to_unit,
                                      to_unit_device)
from vqvae2_tpu.models.vqvae import VQVAE
from vqvae2_tpu.utils import schedules
from vqvae2_tpu.utils.checkpoint import CheckpointManager
from vqvae2_tpu.utils.image import save_image

LATENT_LOSS_WEIGHT = 0.25  # reference train_vqvae.py:34


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    vq_stats: Any
    opt_state: Any


def create_state(model: VQVAE, tx: optax.GradientTransformation,
                 rng: jax.Array, sample_shape: Tuple[int, ...]) -> TrainState:
    variables = model.init(rng, jnp.zeros(sample_shape, jnp.float32))
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        vq_stats=variables["vq_stats"],
        opt_state=tx.init(params),
    )


def make_train_step(model: VQVAE, tx: optax.GradientTransformation,
                    latent_weight: float = LATENT_LOSS_WEIGHT,
                    grad_accum: int = 1):
    """Returns jitted (state, batch) -> (state, metrics).

    ``grad_accum > 1`` scans ``grad_accum`` microbatches inside the ONE
    jitted program — mean-of-mean losses make the summed-then-averaged
    gradient identical to the full-batch gradient, and a single optimizer
    update fires at the end.  The batch must then arrive as
    ``(grad_accum, rows, H, W, C)`` (see ``par.shard_microbatches``).  This
    is the in-jit microbatching the reference gets from just raising the DDP
    batch (``train_vqvae.py:199``) — here it also keeps the traced program at
    microbatch size (the scan body is traced once), which is what fits a
    b32-equivalent 256px step under the remote-compile graph ceiling.  The
    VQ codebook EMA advances per microbatch through the scan carry.
    """

    def loss_fn(params, vq_stats, x):
        x = to_unit_device(x)  # raw-uint8 batches normalize on device
        (dec, diff), new_vars = model.apply(
            {"params": params, "vq_stats": vq_stats}, x,
            train=True, mutable=["vq_stats"],
        )
        recon = jnp.mean(jnp.square(dec - x))
        loss = recon + latent_weight * diff
        return loss, (recon, diff, new_vars["vq_stats"])

    # Donate the state: params/opt/EMA buffers are rewritten in place,
    # halving peak HBM for the step (XLA aliases in->out buffers).
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, x: jax.Array):
        (loss, (recon, diff, vq_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.vq_stats, x)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params,
            vq_stats=vq_stats, opt_state=opt_state,
        )
        metrics = {"loss": loss, "recon_mse": recon, "latent": diff}
        return new_state, metrics

    if grad_accum == 1:
        return train_step

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step_accum(state: TrainState, xs: jax.Array):
        def micro(carry, xm):
            vq_stats, gsum = carry
            (loss, (recon, diff, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, vq_stats, xm)
            gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
            return (new_stats, gsum), jnp.stack([loss, recon, diff])

        zeros = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
        (vq_stats, gsum), ms = jax.lax.scan(
            micro, (state.vq_stats, zeros), xs)
        grads = jax.tree_util.tree_map(lambda g: g / grad_accum, gsum)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params,
            vq_stats=vq_stats, opt_state=opt_state,
        )
        m = jnp.mean(ms, axis=0)
        return new_state, {"loss": m[0], "recon_mse": m[1], "latent": m[2]}

    return train_step_accum


def make_eval_step(model: VQVAE):
    @jax.jit
    def eval_step(state: TrainState, x: jax.Array):
        dec, diff = model.apply(
            {"params": state.params, "vq_stats": state.vq_stats},
            to_unit_device(x))
        return dec

    return eval_step


def train(args) -> Dict[str, float]:
    mesh = par.default_mesh()
    # raw=True: uint8 pixels ship to the device and normalize in-jit — 4x
    # less host->device traffic than pre-normalized fp32
    if args.synthetic:
        dataset = SyntheticImages(n=args.batch_size * 8, size=args.size)
    elif args.shapes:
        from vqvae2_tpu.data.shapes import ShapesDataset

        dataset = ShapesDataset(n=args.shapes, size=args.size, seed=args.seed,
                                raw=True)
    else:
        dataset = ImageFileDataset(args.path, size=args.size, raw=True)
    steps_per_epoch = max(len(dataset) // args.batch_size, 1)
    total_steps = args.steps or steps_per_epoch * args.epoch

    model = VQVAE(
        in_channel=3, channel=args.channel, n_res_block=args.n_res_block,
        n_res_channel=args.n_res_channel, embed_dim=args.embed_dim,
        n_embed=args.n_embed,
        restart_threshold=getattr(args, "restart_threshold", 0.0),
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )
    if args.sched == "cycle":
        tx = schedules.cycle_adam(args.lr, total_steps)
    else:
        tx = optax.adam(args.lr)

    state = create_state(model, tx, jax.random.PRNGKey(args.seed),
                         (1, args.size, args.size, 3))
    if args.resume and args.ckpt_dir:
        mgr = CheckpointManager(args.ckpt_dir)
        state, name = mgr.restore_latest(state)
        if par.is_primary():
            print(f"resumed from {args.ckpt_dir}/{name}" if name else
                  f"no checkpoint in {args.ckpt_dir}; starting fresh",
                  flush=True)
    state = par.replicate(state, mesh)
    if args.grad_accum > 1 and args.batch_size % args.grad_accum:
        raise SystemExit(f"--batch_size {args.batch_size} not divisible by "
                         f"--grad_accum {args.grad_accum}")
    train_step = make_train_step(model, tx, grad_accum=args.grad_accum)
    eval_step = make_eval_step(model)

    ckpt = CheckpointManager(args.ckpt_dir, config=vars(args)) if args.ckpt_dir else None
    from vqvae2_tpu.utils.metrics import CsvLogger, TensorBoardWriter

    tb = TensorBoardWriter(args.logdir)
    csv = CsvLogger(args.metrics_csv)

    it = iterate_batches(dataset, args.batch_size, seed=args.seed,
                         epochs=None if args.steps else args.epoch,
                         workers=args.workers)
    metrics_hist: Dict[str, float] = {}
    t0 = time.perf_counter()
    n_done = 0
    for imgs, labels, paths in it:
        if args.grad_accum > 1:
            x = par.shard_microbatches(
                imgs.reshape(args.grad_accum, -1, *imgs.shape[1:]), mesh)
        else:
            x = par.shard_batch(imgs, mesh)
        state, metrics = train_step(state, x)
        n_done += 1
        if n_done % args.log_every == 0 and par.is_primary():
            m = par.reduce_dict(metrics)
            rate = n_done * args.batch_size / (time.perf_counter() - t0)
            print(f"step {n_done}/{total_steps} "
                  f"loss {m['loss']:.4f} mse {m['recon_mse']:.4f} "
                  f"latent {m['latent']:.4f} ({rate:.1f} img/s)", flush=True)
            tb.add_scalars(m, n_done, prefix="train/")
            csv.log(n_done, dict(m, img_per_s=rate))
            metrics_hist = m
        if args.sample_every and n_done % args.sample_every == 0 and par.is_primary():
            dec = eval_step(state, par.shard_batch(imgs[:8], mesh))
            head = (normalize_to_unit(imgs[:8])
                    if imgs.dtype == np.uint8 else imgs[:8])
            grid = np.concatenate([head, np.asarray(dec[:8])], axis=0)
            save_image(grid, f"{args.sample_dir}/{n_done:05d}.png", nrow=8)
        if ckpt and n_done % (steps_per_epoch * 10) == 0:
            # every-10-epochs periodic save (reference train_vqvae.py:205-206)
            ckpt.save_periodic(n_done, state)
        if n_done >= total_steps:
            break

    if ckpt:
        ckpt.save_last(state)
    return par.reduce_dict(metrics) if metrics_hist == {} else metrics_hist


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Stage-1 VQ-VAE-2 trainer (TPU)")
    p.add_argument("path", nargs="?", default=None, help="image directory")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--epoch", type=int, default=560)      # reference default
    p.add_argument("--steps", type=int, default=0, help="override total steps")
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--batch_size", type=int, default=128)  # global batch
    p.add_argument("--sched", type=str, default="", choices=["", "cycle"])
    p.add_argument("--channel", type=int, default=128)
    p.add_argument("--n_res_block", type=int, default=2)
    p.add_argument("--n_res_channel", type=int, default=32)
    p.add_argument("--embed_dim", type=int, default=64)
    p.add_argument("--n_embed", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--shapes", type=int, default=0, metavar="N",
                   help="train on N in-memory procedural structured images "
                        "(data/shapes.py) instead of an image directory")
    p.add_argument("--restart_threshold", type=float, default=0.0,
                   help="dead-code restart: re-seed codes whose EMA cluster "
                        "size falls below this from batch vectors (0 = off, "
                        "reference parity; ~0.03 prevents small-batch "
                        "codebook collapse)")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="split the global batch into this many sequential "
                        "microbatches inside ONE jitted step (summed grads, "
                        "one optimizer update) — b32-equivalent steps at 256px "
                        "without tracing a b32 graph")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 conv/matmul compute (params stay fp32; the "
                        "quantizer distance search stays exact fp32)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--ckpt_dir", type=str, default="")
    p.add_argument("--sample_dir", type=str, default="sample")
    p.add_argument("--sample_every", type=int, default=0)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--workers", type=int, default=4,
                   help="decode thread pool size (reference DataLoader "
                        "num_workers, train_vqvae.py:199-201); 0 = inline")
    p.add_argument("--logdir", type=str, default="",
                   help="TensorBoard scalar logdir (optional)")
    p.add_argument("--metrics_csv", type=str, default="",
                   help="append per-log-step scalars to this CSV (loss curves)")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if not args.synthetic and not args.shapes and not args.path:
        raise SystemExit("provide an image directory, --shapes N, or --synthetic")
    return par.launch(train, args)


if __name__ == "__main__":
    main()
