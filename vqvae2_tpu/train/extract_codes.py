"""Stage-1→2 bridge: run the trained VQ-VAE encoder over a dataset and write
integer code indices into the native code store.

TPU rebuild of reference ``extract_code.py`` (``:14-33,36-68``): there, a
single-GPU eval loop pickles ``CodeRow`` tuples into LMDB; here a jitted
encode runs over globally-sharded batches and the host streams (top, bottom,
label, name) rows into ``CodeStore`` — no pickling, no transactions.

Run: ``python -m vqvae2_tpu.train.extract_codes <img_dir> --ckpt_dir ... --name codes.vq2``
(or ``--synthetic`` + ``--random_init`` for a smoke run).
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from vqvae2_tpu import parallel as par
from vqvae2_tpu.data.codestore import CodeStoreWriter
from vqvae2_tpu.data.datasets import ImageFileDataset, SyntheticImages, iterate_batches
from vqvae2_tpu.models.vqvae import VQVAE
from vqvae2_tpu.utils.checkpoint import CheckpointManager


def extract(model: VQVAE, variables, dataset, out_path: str,
            batch_size: int = 64, size: int = 256, workers: int = 4) -> int:
    mesh = par.default_mesh()

    from vqvae2_tpu.data.datasets import to_unit_device

    @jax.jit
    def encode(variables, x):
        # ids-only path: skips the bottom-grid lookup matmul and stat
        # outputs the store never consumes.  Raw uint8 batches normalize
        # here (4x less host->device traffic than fp32).
        return model.apply(variables, to_unit_device(x),
                           method=model.encode_ids)

    top_shape = (size // 8, size // 8)
    bot_shape = (size // 4, size // 4)
    writer = CodeStoreWriter(out_path, top_shape, bot_shape)
    n = 0
    for imgs, labels, paths in iterate_batches(
        dataset, batch_size, shuffle=False, drop_last=False, epochs=1,
        workers=workers,
    ):
        pad = 0
        if len(imgs) % jax.device_count() != 0:
            pad = jax.device_count() - len(imgs) % jax.device_count()
            imgs = np.concatenate([imgs, np.zeros_like(imgs[:pad])], axis=0)
        x = par.shard_batch(imgs, mesh)
        id_t, id_b = encode(variables, x)
        id_t, id_b = np.asarray(id_t), np.asarray(id_b)
        if pad:
            id_t, id_b = id_t[:-pad], id_b[:-pad]
        n = writer.append(id_t.astype(np.int16), id_b.astype(np.int16),
                          labels, paths)
        if n % (batch_size * 20) < batch_size:
            print(f"extracted {n}", flush=True)
    writer.close()
    return n


def main(argv=None):
    p = argparse.ArgumentParser(description="Extract VQ codes into a CodeStore")
    p.add_argument("path", nargs="?", default=None)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--ckpt_dir", type=str, default="")
    p.add_argument("--ckpt_name", type=str, default="last")
    p.add_argument("--torch_ckpt", type=str, default="",
                   help="reference PyTorch VQVAE checkpoint (e.g. "
                        "vqvae_560.pt) to import instead of a native ckpt")
    p.add_argument("--name", type=str, default="codes.vq2")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--shapes", type=int, default=0, metavar="N",
                   help="encode N procedural structured images (data/shapes.py) "
                        "— must match the --shapes corpus the VQVAE trained on")
    p.add_argument("--random_init", action="store_true",
                   help="skip checkpoint restore (smoke runs)")
    p.add_argument("--workers", type=int, default=4,
                   help="decode thread pool size; 0 = inline")
    # model config (overridden by the checkpoint's config.json when present)
    p.add_argument("--channel", type=int, default=128)
    p.add_argument("--n_res_block", type=int, default=2)
    p.add_argument("--n_res_channel", type=int, default=32)
    p.add_argument("--embed_dim", type=int, default=64)
    p.add_argument("--n_embed", type=int, default=512)
    args = p.parse_args(argv)

    if args.synthetic:
        dataset = SyntheticImages(n=args.batch_size * 4, size=args.size)
    elif args.shapes:
        from vqvae2_tpu.data.shapes import ShapesDataset

        dataset = ShapesDataset(n=args.shapes, size=args.size, raw=True)
    else:
        dataset = ImageFileDataset(args.path, size=args.size, raw=True)

    cfg = {}
    if args.ckpt_dir:
        mgr = CheckpointManager(args.ckpt_dir)
        cfg = mgr.load_config() or {}
    model = VQVAE(
        channel=cfg.get("channel", args.channel),
        n_res_block=cfg.get("n_res_block", args.n_res_block),
        n_res_channel=cfg.get("n_res_channel", args.n_res_channel),
        embed_dim=cfg.get("embed_dim", args.embed_dim),
        n_embed=cfg.get("n_embed", args.n_embed),
    )
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, args.size, args.size, 3), jnp.float32))
    if args.torch_ckpt:
        import torch

        from vqvae2_tpu.utils.torch_import import import_vqvae

        ckpt = torch.load(args.torch_ckpt, map_location="cpu")
        sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
        variables = import_vqvae(sd, variables)
    elif args.ckpt_dir and not args.random_init:
        from vqvae2_tpu.train.vqvae import TrainState  # template for restore
        import optax
        tx = optax.adam(1e-4)
        template = TrainState(step=jnp.zeros((), jnp.int32),
                              params=variables["params"],
                              vq_stats=variables["vq_stats"],
                              opt_state=tx.init(variables["params"]))
        state = mgr.restore(args.ckpt_name, template)
        variables = {"params": state.params, "vq_stats": state.vq_stats}

    n = par.launch(extract, model, variables, dataset, args.name,
                   batch_size=args.batch_size, size=args.size,
                   workers=args.workers)
    print(f"wrote {n} code rows to {args.name}")


if __name__ == "__main__":
    main()
