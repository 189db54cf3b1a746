"""Stage-2 PixelSNAIL prior trainer over extracted codes.

TPU rebuild of reference ``train_pixelsnail.py``: cross-entropy over the
512-way codebook, ``--hier top`` = unconditional 32×32 attention prior,
``--hier bottom`` = conditional 64×64 attention-free prior
(reference ``train_pixelsnail.py:104-130``); accuracy tracked (``:46-48``);
1-cycle schedule option (``:145-148``).

TPU design notes: the reference's single-process ``nn.DataParallel`` scatter
(``:141``) and apex AMP (``:138-139``) are replaced by a GSPMD-sharded global
batch and native bf16 compute; the code rows stream from the native
``CodeStore`` (thread-parallel gather) instead of LMDB unpickling.
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
from vqvae2_tpu.data.codestore import CodeStore
from vqvae2_tpu.models.pixelsnail import PixelSNAIL
from vqvae2_tpu.utils import schedules
from vqvae2_tpu.utils.checkpoint import CheckpointManager


class PriorState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any


def build_model(hier: str, args, code_hw=(32, 64)) -> PixelSNAIL:
    """Top/bottom configs per reference train_pixelsnail.py:104-130.

    ``args.bf16`` selects bfloat16 conv/matmul compute (fp32 params, fp32
    logits/loss) — the native analogue of the reference's apex AMP option
    (``train_pixelsnail.py:9-13,138-139``)."""
    dtype = jnp.bfloat16 if getattr(args, "bf16", False) else jnp.float32
    top_hw, bot_hw = code_hw
    if hier == "top":
        return PixelSNAIL(
            shape=(top_hw, top_hw), n_class=args.n_class, channel=args.channel,
            kernel_size=5, n_block=4, n_res_block=args.n_res_block,
            res_channel=args.n_res_channel, dropout=args.dropout,
            n_out_res_block=args.n_out_res_block, dtype=dtype,
        )
    return PixelSNAIL(
        shape=(bot_hw, bot_hw), n_class=args.n_class, channel=args.channel,
        kernel_size=5, n_block=4, n_res_block=args.n_res_block,
        res_channel=args.n_res_channel, attention=False, dropout=args.dropout,
        n_cond_res_block=args.n_cond_res_block,
        cond_res_channel=args.n_res_channel, dtype=dtype,
    )


def make_train_step(model: PixelSNAIL, tx, conditional: bool):
    def loss_fn(params, batch, rng):
        codes = batch["target"]
        logits = model.apply(
            {"params": params}, codes,
            condition=batch["condition"] if conditional else None,
            train=True, rngs={"dropout": rng},
        )
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), codes).mean()
        acc = jnp.mean(jnp.argmax(logits, axis=-1) == codes)
        return ce, acc

    # Donate the state: params/opt/EMA buffers are rewritten in place,
    # halving peak HBM for the step (XLA aliases in->out buffers).
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: PriorState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(step=state.step + 1, params=params, opt_state=opt_state),
            {"loss": loss, "acc": acc},
        )

    return train_step


def train(args):
    mesh = par.default_mesh()
    store = CodeStore(args.path)
    th, tw = store.top_shape
    bh, bw = store.bot_shape
    steps_per_epoch = max(len(store) // args.batch, 1)
    total_steps = args.steps or steps_per_epoch * args.epoch

    conditional = args.hier == "bottom"
    model = build_model(args.hier, args, code_hw=(th, bh))

    if args.sched == "cycle":
        tx = schedules.cycle_adam(args.lr, total_steps, momentum=None)
    else:
        tx = optax.adam(args.lr)

    hw = bh if conditional else th
    init_codes = jnp.zeros((1, hw, hw), jnp.int32)
    init_cond = jnp.zeros((1, th, tw), jnp.int32) if conditional else None
    variables = model.init(jax.random.PRNGKey(args.seed), init_codes,
                           condition=init_cond)
    state = PriorState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                       opt_state=tx.init(variables["params"]))
    state = par.replicate(state, mesh)
    train_step = make_train_step(model, tx, conditional)
    # Hardware-RNG dropout stream: threefry bit generation for the 16
    # per-resblock dropout masks costs ~60 ms/step on the VPU at the bottom
    # config (measured: 273 -> 217 ms/step with unsafe_rbg); dropout needs
    # no cryptographic stream.
    rng = jax.random.key(args.seed + 1, impl="unsafe_rbg")

    from vqvae2_tpu.utils.metrics import CsvLogger

    csv = CsvLogger(getattr(args, "metrics_csv", ""))
    ckpt = CheckpointManager(args.ckpt_dir, config=vars(args)) if args.ckpt_dir else None
    if ckpt and args.resume:
        state, name = ckpt.restore_latest(state)
        if name is not None:
            state = par.replicate(state, mesh)
        if par.is_primary():
            print(f"resumed from {args.ckpt_dir}/{name}" if name else
                  f"no checkpoint in {args.ckpt_dir}; starting fresh",
                  flush=True)

    order_rng = np.random.default_rng(args.seed)
    t0, n_done, m = time.perf_counter(), 0, {}
    while n_done < total_steps:
        order = order_rng.permutation(len(store))
        for s in range(0, len(order) - args.batch + 1, args.batch):
            idx = order[s : s + args.batch]
            tops, bots, labels = store.gather(idx)
            if conditional:
                batch = {"target": bots.astype(np.int32),
                         "condition": tops.astype(np.int32)}
            else:
                batch = {"target": tops.astype(np.int32)}
            batch = par.shard_batch(batch, mesh)
            state, metrics = train_step(state, batch, rng)
            n_done += 1
            if n_done % args.log_every == 0 and par.is_primary():
                m = par.reduce_dict(metrics)
                rate = n_done * args.batch / (time.perf_counter() - t0)
                print(f"step {n_done}/{total_steps} loss {m['loss']:.5f} "
                      f"acc {m['acc']:.5f} ({rate:.1f} codes-rows/s)", flush=True)
                csv.log(n_done, dict(m, rows_per_s=rate))
            if ckpt and n_done % (steps_per_epoch * 10) == 0:
                ckpt.save_periodic(n_done, state)
            if n_done >= total_steps:
                break
    if ckpt:
        ckpt.save_last(state)
    return m


def build_argparser():
    p = argparse.ArgumentParser(description="Stage-2 PixelSNAIL prior trainer (TPU)")
    p.add_argument("path", help="code store file (.vq2)")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--epoch", type=int, default=420)
    p.add_argument("--steps", type=int, default=0)
    p.add_argument("--hier", type=str, default="top", choices=["top", "bottom"])
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--n_class", type=int, default=512)
    p.add_argument("--channel", type=int, default=256)
    p.add_argument("--n_res_block", type=int, default=4)
    p.add_argument("--n_res_channel", type=int, default=256)
    p.add_argument("--n_out_res_block", type=int, default=0)
    p.add_argument("--n_cond_res_block", type=int, default=3)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 conv/matmul compute (fp32 params/loss; "
                        "the reference's apex AMP analogue)")
    p.add_argument("--sched", type=str, default="")
    p.add_argument("--ckpt_dir", type=str, default="")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--metrics_csv", type=str, default="",
                   help="append per-log-step scalars to this CSV (loss curves)")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    return par.launch(train, args)


if __name__ == "__main__":
    main()
