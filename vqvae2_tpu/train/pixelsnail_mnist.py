"""Smallest runnable PixelSNAIL workload — TPU rebuild of reference
``pixelsnail_mnist.py`` (``:11-60``): PixelSNAIL([28,28], 256, 128, 5,
n_block=2, n_res_block=4, res_channel=128) trained with CE to reproduce the
image's own 256-level pixel intensities.

Data: MNIST idx files from ``--path`` when present (``train-images-idx3-ubyte``
— no downloads in this environment), otherwise deterministic synthetic
digit-like blobs so the workload runs anywhere.
"""

from __future__ import annotations

import argparse
import functools
import gzip
import os
import struct
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vqvae2_tpu import parallel as par
from vqvae2_tpu.models.pixelsnail import PixelSNAIL
from vqvae2_tpu.train.pixelsnail import PriorState


def load_mnist_images(path: str) -> np.ndarray:
    """Read MNIST idx3 images (optionally .gz)."""
    for name in ("train-images-idx3-ubyte", "train-images.idx3-ubyte"):
        for ext in ("", ".gz"):
            p = os.path.join(path, name + ext)
            if os.path.exists(p):
                op = gzip.open if ext else open
                with op(p, "rb") as f:
                    magic, n, h, w = struct.unpack(">IIII", f.read(16))
                    assert magic == 2051, f"bad idx magic {magic}"
                    return np.frombuffer(f.read(), np.uint8).reshape(n, h, w)
    raise FileNotFoundError(f"no MNIST idx files under {path}")


def synthetic_digits(n: int = 512, seed: int = 0) -> np.ndarray:
    """Digit-ish blobs: random strokes on 28×28 canvases."""
    rng = np.random.default_rng(seed)
    imgs = np.zeros((n, 28, 28), np.uint8)
    for i in range(n):
        pts = rng.integers(4, 24, size=(6, 2))
        for (y0, x0), (y1, x1) in zip(pts[:-1], pts[1:]):
            steps = max(abs(y1 - y0), abs(x1 - x0), 1)
            ys = np.linspace(y0, y1, steps * 2).astype(int)
            xs = np.linspace(x0, x1, steps * 2).astype(int)
            imgs[i, ys, xs] = rng.integers(128, 256)
        # slight blur via box filter
        padded = np.pad(imgs[i], 1)
        imgs[i] = (padded[:-2, :-2].astype(np.int32) + padded[1:-1, 1:-1] * 4
                   + padded[2:, 2:]) // 6
    return imgs


def train(args):
    mesh = par.default_mesh()
    if args.path:
        images = load_mnist_images(args.path)
    else:
        images = synthetic_digits(args.n_synthetic, args.seed)
    steps_per_epoch = max(len(images) // args.batch, 1)
    total_steps = args.steps or steps_per_epoch * args.epoch

    model = PixelSNAIL(
        shape=(28, 28), n_class=256, channel=args.channel, kernel_size=5,
        n_block=2, n_res_block=4, res_channel=args.channel,
        dropout=args.dropout,
    )
    tx = optax.adam(args.lr)
    variables = model.init(jax.random.PRNGKey(args.seed),
                           jnp.zeros((1, 28, 28), jnp.int32))
    state = PriorState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       opt_state=tx.init(variables["params"]))
    state = par.replicate(state, mesh)

    # Donate the state: params/opt/EMA buffers are rewritten in place,
    # halving peak HBM for the step (XLA aliases in->out buffers).
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, codes, rng):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            logits = model.apply({"params": params}, codes, train=True,
                                 rngs={"dropout": rng})
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, codes).mean()
            acc = jnp.mean(jnp.argmax(logits, -1) == codes)
            return ce, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), {"loss": loss, "acc": acc}

    # hardware-RNG dropout stream (see train/pixelsnail.py) — threefry bit
    # generation dominates VPU time for per-resblock dropout otherwise
    rng = jax.random.key(args.seed + 1, impl="unsafe_rbg")
    order_rng = np.random.default_rng(args.seed)
    from vqvae2_tpu.utils.metrics import CsvLogger

    csv = CsvLogger(args.metrics_csv)
    n_done, m, t0 = 0, {}, time.perf_counter()
    while n_done < total_steps:
        order = order_rng.permutation(len(images))
        for s in range(0, len(order) - args.batch + 1, args.batch):
            codes = images[order[s: s + args.batch]].astype(np.int32)
            codes = par.shard_batch(codes, mesh)
            state, metrics = train_step(state, codes, rng)
            n_done += 1
            if n_done % args.log_every == 0 and par.is_primary():
                m = par.reduce_dict(metrics)
                rate = n_done * args.batch / (time.perf_counter() - t0)
                print(f"step {n_done}/{total_steps} loss {m['loss']:.4f} "
                      f"acc {m['acc']:.4f} ({rate:.1f} img/s)", flush=True)
                csv.log(n_done, dict(m, img_per_s=rate))
            if n_done >= total_steps:
                break
    return m


def build_argparser():
    p = argparse.ArgumentParser(description="PixelSNAIL on MNIST (TPU)")
    p.add_argument("--path", type=str, default="", help="MNIST idx dir")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--epoch", type=int, default=10)
    p.add_argument("--steps", type=int, default=0)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--channel", type=int, default=128)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--n_synthetic", type=int, default=512)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--metrics_csv", type=str, default="",
                   help="append per-log-step scalars to this CSV (loss curves)")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    return par.launch(train, args)


if __name__ == "__main__":
    main()
