"""Hierarchical generation: sample top prior → sample bottom prior
conditioned on top → VQ-VAE ``decode_code`` → PNG grid.

TPU rebuild of reference ``sample.py:75-100`` (which rebuilds the three models
from checkpoint args, ``sample.py:27-72`` — mirrored here via each
CheckpointManager's stored ``config.json``).
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vqvae2_tpu.models.incremental import sample_prior_incremental
from vqvae2_tpu.models.pixelsnail import PixelSNAIL
from vqvae2_tpu.models.sampling import sample_prior
from vqvae2_tpu.models.vqvae import VQVAE
from vqvae2_tpu.train.pixelsnail import PriorState, build_model
from vqvae2_tpu.utils.checkpoint import CheckpointManager
from vqvae2_tpu.utils.image import save_image


def _restore_prior(ckpt_dir: str, hier: str, code_hw) -> tuple:
    mgr = CheckpointManager(ckpt_dir)
    cfg = mgr.load_config() or {}
    args = argparse.Namespace(**{
        "n_class": cfg.get("n_class", 512), "channel": cfg.get("channel", 256),
        "n_res_block": cfg.get("n_res_block", 4),
        "n_res_channel": cfg.get("n_res_channel", 256),
        "n_out_res_block": cfg.get("n_out_res_block", 0),
        "n_cond_res_block": cfg.get("n_cond_res_block", 3),
        "dropout": cfg.get("dropout", 0.1),
    })
    model = build_model(hier, args, code_hw=code_hw)
    hw = code_hw[0] if hier == "top" else code_hw[1]
    cond = jnp.zeros((1, code_hw[0], code_hw[0]), jnp.int32) if hier == "bottom" else None
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, hw, hw), jnp.int32), condition=cond)
    tx = optax.adam(1e-4)
    template = PriorState(step=jnp.zeros((), jnp.int32),
                          params=variables["params"],
                          opt_state=tx.init(variables["params"]))
    state = mgr.restore("last", template)
    return model, {"params": state.params}


def _restore_vqvae(ckpt_dir: str, size: int):
    from vqvae2_tpu.train.vqvae import TrainState

    mgr = CheckpointManager(ckpt_dir)
    cfg = mgr.load_config() or {}
    model = VQVAE(
        channel=cfg.get("channel", 128), n_res_block=cfg.get("n_res_block", 2),
        n_res_channel=cfg.get("n_res_channel", 32),
        embed_dim=cfg.get("embed_dim", 64), n_embed=cfg.get("n_embed", 512),
    )
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, size, size, 3), jnp.float32))
    tx = optax.adam(1e-4)
    template = TrainState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                          vq_stats=variables["vq_stats"],
                          opt_state=tx.init(variables["params"]))
    state = mgr.restore("last", template)
    return model, {"params": state.params, "vq_stats": state.vq_stats}


def main(argv=None):
    p = argparse.ArgumentParser(description="Hierarchical VQ-VAE-2 sampling (TPU)")
    p.add_argument("filename", help="output PNG")
    p.add_argument("--vqvae", type=str, required=True, help="vqvae ckpt dir")
    p.add_argument("--top", type=str, required=True, help="top prior ckpt dir")
    p.add_argument("--bottom", type=str, required=True, help="bottom prior ckpt dir")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--temp", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--full_forward", action="store_true",
                   help="use the O(HW)-reforward sampler instead of the "
                        "incremental cached decoder")
    args = p.parse_args(argv)

    th = args.size // 8
    bh = args.size // 4
    vqvae, vq_vars = _restore_vqvae(args.vqvae, args.size)
    top_model, top_vars = _restore_prior(args.top, "top", (th, bh))
    bot_model, bot_vars = _restore_prior(args.bottom, "bottom", (th, bh))

    rng = jax.random.PRNGKey(args.seed)
    r_top, r_bot = jax.random.split(rng)
    if args.full_forward:
        top = sample_prior(top_model, top_vars, r_top, args.batch, (th, th),
                           temperature=args.temp)
        bottom = sample_prior(bot_model, bot_vars, r_bot, args.batch, (bh, bh),
                              temperature=args.temp, condition=top)
    else:
        # cached decoder: ~HW× fewer FLOPs/step (17× measured on v5e)
        top = sample_prior_incremental(top_model, top_vars, r_top, args.batch,
                                       temperature=args.temp)
        bottom = sample_prior_incremental(bot_model, bot_vars, r_bot,
                                          args.batch, temperature=args.temp,
                                          condition=top)

    decoded = vqvae.apply(vq_vars, top, bottom, method=vqvae.decode_code)
    decoded = np.clip(np.asarray(decoded), -1.0, 1.0)
    save_image(decoded, args.filename, nrow=args.batch)
    print(f"wrote {args.filename}")


if __name__ == "__main__":
    main()
