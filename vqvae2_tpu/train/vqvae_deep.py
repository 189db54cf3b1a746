"""Deep adaptive trainer — TPU rebuild of reference ``train_vqvae_deep.py``:
ModelAdaptive_Deep with a ReID step and a generator step per batch.

Per-batch recipe (reference ``train_vqvae_deep.py:59-146``):

1. **ReID step** (Adam #1): id CE + batch-hard triplet + within-identity
   feature variance on the RGB view (``:72-90``).
2. Activation-map thresholding builds ``upMask`` — median±offsets snap the
   norm-attention map to {0,1} and ×16 bilinear upsample (``:72-79``).
3. Random convex channel mix makes the gray view (``:96-98``).
4. **Generator step** (Adam #2): encode RGB/gray/IR contents; fuse
   gray/IR contents with masked person features (x3/x4); masked recon losses
   against the RGB image, content-consistency MSE between gray and RGB
   latents, 0.25-weighted latent losses, and the IR-fake identity loss with
   the ReID net FROZEN (``:100-140``) — frozen here means: gradients flow only
   to generator params (the reid subtree is simply not differentiated) and
   batch-norm runs in eval mode for that pass.
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
from vqvae2_tpu.utils.checkpoint import CheckpointManager

LATENT_LOSS_WEIGHT = 0.25


def _e3(x):
    return jnp.repeat(x, 3, axis=-1) if x.shape[-1] == 1 else x


def threshold_up_mask(act_map, hw):
    """Median±offset snap of the norm-attention map to {0,1} plus the bilinear
    upsample to image size (reference ``train_vqvae_deep.py:72-79``)."""
    bs = act_map.shape[0]
    m = jnp.median(act_map.reshape(bs, -1), axis=1).reshape(bs, 1, 1, 1)
    am = jnp.where(act_map < m - 0.1, 0.0,
                   jnp.where(act_map > m + 0.02, 1.0, act_map))
    up = jax.image.resize(am, (bs, hw[0], hw[1], 1), method="bilinear")
    return am, up


def random_gray(rng, img1):
    """Random convex channel mix → 3-channel gray view (reference ``:96-98``)."""
    bs = img1.shape[0]
    w = jax.random.uniform(rng, (bs, 3)) + 0.01
    w = w / jnp.sum(w, axis=1, keepdims=True)
    return jnp.repeat(jnp.einsum("bhwc,bc->bhw", img1, w)[..., None], 3, -1)


class DeepState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    vq_stats: Any
    opt_reid: Any
    opt_gen: Any


def _split_params(params):
    reid = {"person_id": params["person_id"]}
    gen = {k: v for k, v in params.items() if k != "person_id"}
    return reid, gen


def _gen_forward(module: ModelAdaptive_Deep, img1, img2, gray, feat,
                 mf3, mf4, ids):
    """The whole generator pass in ONE module scope (mutable collections —
    vq_stats EMA, BN stats — thread automatically across the sub-calls)."""
    rgb_b, rgb_t = module.encode_content(img1)
    rgb_content, latent_rgb = module.quantize_content(rgb_b, rgb_t, train=True)
    rgb_reconst = module.decode(rgb_content, feat)

    gray_b, gray_t = module.encode_content(gray)
    gb_f, gt_f = module.fuse(gray_b, gray_t, mf3, mf4, train=True)
    gray_content, latent_gray = module.quantize_content(gb_f, gt_f, train=True)
    rgb_fake = module.decode(gray_content, feat)

    gb_o, gt_o = module.fuse(gray_b, gray_t, mf3[ids], mf4[ids], train=True)
    gray_other, latent_other = module.quantize_content(gb_o, gt_o, train=True)
    rgb_fake_other = module.decode(gray_other, feat)

    ir_b, ir_t = module.encode_content(img2)
    ib_f, it_f = module.fuse(ir_b, ir_t, mf3, mf4, train=True)
    ir_content, latent_ir = module.quantize_content(ib_f, it_f, train=True)
    ir_fake = module.decode(ir_content, feat)

    # frozen-reid IR-fake pass (eval-mode BN; reid grads cut by the caller)
    if ir_fake.shape[-1] == 1:
        ir_fake3 = jnp.repeat(ir_fake, 3, axis=-1)
    else:
        ir_fake3 = ir_fake
    feat_ir, score_ir, _, _, _ = module.encode_person(ir_fake3, train=False)

    latent = latent_rgb + latent_gray + latent_other + latent_ir
    return (rgb_reconst, rgb_fake, rgb_fake_other, rgb_content, gray_content,
            gray_other, latent, feat_ir, score_ir)


def make_train_step(model: ModelAdaptive_Deep, tx_reid, tx_gen, num_pos: int):
    def reid_loss(reid_params, gen_params, batch_stats, batch, rng):
        params = {**gen_params, **reid_params}
        variables = {"params": params, "batch_stats": batch_stats}
        (feat, score, feat2d, act_map, feat2d_x3), new_vars = model.apply(
            variables, batch["rgb"], train=True, method=model.encode_person,
            mutable=["batch_stats"], rngs={"dropout": rng})
        label1 = batch["label"]
        loss_id = optax.softmax_cross_entropy_with_integer_labels(
            score, label1).mean()
        loss_tri, _ = L.triplet_loss(feat, label1)
        n = label1.shape[0] // num_pos
        var = feat.reshape(n, num_pos, -1).var(axis=1).mean()
        loss = loss_id + loss_tri + var
        aux = (feat, feat2d, act_map, feat2d_x3, new_vars["batch_stats"])
        return loss, aux

    def gen_loss(gen_params, reid_params, state_cols, batch, rng,
                 feat, feat2d, act_map, feat2d_x3):
        params = {**gen_params, **jax.tree_util.tree_map(
            jax.lax.stop_gradient, reid_params)}
        img1, img2 = batch["rgb"], batch["ir"]
        bs = img1.shape[0]
        label2 = batch["label"]

        am, up_mask = threshold_up_mask(act_map, img1.shape[1:3])
        rng, wkey = jax.random.split(rng)
        gray = random_gray(wkey, img1)

        mf3, mf4 = feat2d_x3 * am, feat2d * am
        ids = jnp.roll(jnp.arange(bs), num_pos)  # "other" identity pairing

        outs, new_vars = model.apply(
            {"params": params, **state_cols}, img1, img2, gray, feat,
            mf3, mf4, ids, method=_gen_forward,
            mutable=["batch_stats", "vq_stats"], rngs={"dropout": rng})
        (rgb_reconst, rgb_fake, rgb_fake_other, rgb_content, gray_content,
         gray_other, latent, feat_ir, score_ir) = outs

        loss_id_ir = optax.softmax_cross_entropy_with_integer_labels(
            score_ir, label2).mean()
        loss_feat_ir = jnp.mean(jnp.square(
            feat_ir - jax.lax.stop_gradient(feat)))

        mask_img = img1 * up_mask
        mse = lambda a, b: jnp.mean(jnp.square(a - b))
        recon = (mse(rgb_reconst * up_mask, mask_img)
                 + mse(rgb_fake * up_mask, mask_img)
                 + mse(rgb_fake_other * up_mask, mask_img))
        recon_feat = (mse(gray_content, rgb_content)
                      + mse(gray_other, rgb_content))
        loss_g = recon_feat + recon + LATENT_LOSS_WEIGHT * latent
        total = loss_g + loss_id_ir + loss_feat_ir
        metrics = {"recon": recon, "recon_feat": recon_feat, "latent": latent,
                   "id_ir": loss_id_ir, "feat_ir": loss_feat_ir}
        return total, (metrics, new_vars)

    # Donate the state: params/opt/EMA buffers are rewritten in place,
    # halving peak HBM for the step (XLA aliases in->out buffers).
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: DeepState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        r1, r2 = jax.random.split(rng)
        reid_params, gen_params = _split_params(state.params)

        (loss_re, aux), reid_grads = jax.value_and_grad(
            reid_loss, has_aux=True)(reid_params, gen_params,
                                     state.batch_stats, batch, r1)
        feat, feat2d, act_map, feat2d_x3, batch_stats = aux
        upd, opt_reid = tx_reid.update(reid_grads, state.opt_reid, reid_params)
        reid_params = optax.apply_updates(reid_params, upd)

        state_cols = {"batch_stats": batch_stats, "vq_stats": state.vq_stats}
        (loss_g, (metrics, new_vars)), gen_grads = jax.value_and_grad(
            gen_loss, has_aux=True)(
            gen_params, reid_params, state_cols, batch, r2,
            jax.lax.stop_gradient(feat), jax.lax.stop_gradient(feat2d),
            jax.lax.stop_gradient(act_map), jax.lax.stop_gradient(feat2d_x3))
        upd, opt_gen = tx_gen.update(gen_grads, state.opt_gen, gen_params)
        gen_params = optax.apply_updates(gen_params, upd)

        metrics = {**metrics, "loss_reid": loss_re, "loss_gen": loss_g}
        return state.replace(
            step=state.step + 1, params={**gen_params, **reid_params},
            batch_stats=new_vars["batch_stats"], vq_stats=new_vars["vq_stats"],
            opt_reid=opt_reid, opt_gen=opt_gen,
        ), metrics

    return train_step


def make_sample_fn(model: ModelAdaptive_Deep, num_pos: int):
    """Eval-mode generator pass for sample-grid dumps (the tensors the
    reference saves at ``train_vqvae_deep.py:189-197``): recon, gray→RGB fake,
    other-identity fake, IR fake and the thresholded upMask."""

    def _sample_forward(module, img1, img2, gray, feat, mf3, mf4, ids):
        rgb_b, rgb_t = module.encode_content(img1)
        rgb_content, _ = module.quantize_content(rgb_b, rgb_t, train=False)
        rgb_reconst = module.decode(rgb_content, feat)

        gray_b, gray_t = module.encode_content(gray)
        gb_f, gt_f = module.fuse(gray_b, gray_t, mf3, mf4, train=False)
        gray_content, _ = module.quantize_content(gb_f, gt_f, train=False)
        rgb_fake = module.decode(gray_content, feat)

        gb_o, gt_o = module.fuse(gray_b, gray_t, mf3[ids], mf4[ids],
                                 train=False)
        gray_other, _ = module.quantize_content(gb_o, gt_o, train=False)
        rgb_fake_other = module.decode(gray_other, feat)

        ir_b, ir_t = module.encode_content(img2)
        ib_f, it_f = module.fuse(ir_b, ir_t, mf3, mf4, train=False)
        ir_content, _ = module.quantize_content(ib_f, it_f, train=False)
        ir_fake = module.decode(ir_content, feat)
        return rgb_reconst, rgb_fake, rgb_fake_other, _e3(ir_fake)

    @jax.jit
    def sample(params, batch_stats, vq_stats, batch, rng):
        variables = {"params": params, "batch_stats": batch_stats,
                     "vq_stats": vq_stats}
        img1, img2 = batch["rgb"], batch["ir"]
        feat, _, feat2d, act_map, feat2d_x3 = model.apply(
            variables, img1, train=False, method=model.encode_person)
        am, up_mask = threshold_up_mask(act_map, img1.shape[1:3])
        gray = random_gray(rng, img1)
        mf3, mf4 = feat2d_x3 * am, feat2d * am
        ids = jnp.roll(jnp.arange(img1.shape[0]), num_pos)
        outs = model.apply(variables, img1, img2, gray, feat, mf3, mf4, ids,
                           method=_sample_forward)
        return outs + (up_mask,)

    return sample


def dump_samples(sample_fn, state: DeepState, batch, rng, path: str,
                 max_rows: int = 8) -> None:
    """Host-side grid: one column per example, rows = [real RGB, recon,
    gray→RGB fake, other-id fake, real IR, IR fake, 2·upMask−1] — the layout
    of reference ``train_vqvae_deep.py:189-197``."""
    from vqvae2_tpu.utils.image import save_image

    recon, fake, fake_other, ir_fake, up_mask = sample_fn(
        state.params, state.batch_stats, state.vq_stats, batch, rng)
    k = min(int(batch["rgb"].shape[0]), max_rows)
    take = lambda x: np.asarray(x)[:k]
    mask3 = np.repeat(take(up_mask), 3, axis=-1) * 2.0 - 1.0
    grid = np.concatenate([
        take(batch["rgb"]), take(recon), take(fake), take(fake_other),
        take(batch["ir"]), take(ir_fake), mask3], axis=0)
    save_image(grid, path, nrow=k)


class _PersonShim:
    """Duck-typed ``model`` for :func:`vqvae2_tpu.eval.reid.validate`: routes
    ``apply(variables, xRGB=..., modal=...)`` to the ``person_id`` subnet of
    the adaptive model (the net reference ``train_vqvae_deep.py:268-269``
    validates)."""

    def __init__(self, model):
        self._model = model

    def apply(self, variables, **kwargs):
        return self._model.apply(variables,
                                 method=lambda m: m.person_id(**kwargs))


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
         "dropout": jax.random.PRNGKey(1)},
        probe, method=model.init_probe)
    reid_params, gen_params = _split_params(variables["params"])
    state = DeepState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                      batch_stats=variables.get("batch_stats", {}),
                      vq_stats=variables.get("vq_stats", {}),
                      opt_reid=tx_reid.init(reid_params),
                      opt_gen=tx_gen.init(gen_params))
    if args.resume and args.ckpt_dir:
        mgr = CheckpointManager(args.ckpt_dir)
        state, name = mgr.restore_latest(state)
        if par.is_primary():
            print(f"resumed from {args.ckpt_dir}/{name}" if name else
                  f"no checkpoint in {args.ckpt_dir}; starting fresh",
                  flush=True)
    state = par.replicate(state, mesh)
    ckpt = (CheckpointManager(args.ckpt_dir, config=vars(args))
            if args.ckpt_dir else None)
    step_fn = make_train_step(model, tx_reid, tx_gen, args.num_pos)
    sample_fn = (make_sample_fn(model, args.num_pos)
                 if args.sample_dir else None)
    # hardware-RNG dropout stream (threefry bit generation is VPU-bound;
    # see train/pixelsnail.py)
    rng = jax.random.key(args.seed + 2, impl="unsafe_rbg")
    from vqvae2_tpu.utils.metrics import CsvLogger

    csv = CsvLogger(args.metrics_csv)
    n_done, t0, m = 0, time.perf_counter(), {}
    epoch = 0
    while n_done < total_steps:
        dataset.samplize(args.batch_size, args.num_pos)
        for rows in epoch_row_batches(dataset, loader_batch):
            batch = {
                "rgb": np.stack([r[0] for r in rows]),
                "ir": np.stack([r[1] for r in rows]),
                "label": np.asarray([r[2] for r in rows], np.int32),
            }
            batch = par.shard_batch(batch, mesh)
            state, metrics = step_fn(state, batch, rng)
            n_done += 1
            if n_done % args.log_every == 0 and par.is_primary():
                m = par.reduce_dict(metrics)
                print(f"step {n_done}/{total_steps} "
                      f"reid {m['loss_reid']:.3f} gen {m['loss_gen']:.3f} "
                      f"recon {m['recon']:.4f} latent {m['latent']:.4f}",
                      flush=True)
                csv.log(n_done, m)
            if (sample_fn is not None and n_done % args.sample_every == 0
                    and par.is_primary()):
                dump_samples(sample_fn, state, batch,
                             jax.random.fold_in(rng, n_done),
                             f"{args.sample_dir}/{n_done:05d}.png")
            if ckpt and n_done % (steps_per_epoch * 10) == 0:
                ckpt.save_periodic(n_done, state)
            if n_done >= total_steps:
                break
        epoch += 1
        if (args.eval_every and args.eval_path
                and epoch % args.eval_every == 0 and par.is_primary()):
            # periodic person-ReID validation through the person_id subnet
            # (reference train_vqvae_deep.py:268-269)
            from vqvae2_tpu.eval.reid import validate

            mAP = validate(
                _PersonShim(model),
                {"params": state.params, "batch_stats": state.batch_stats},
                args.eval_path, img_size=(w, h), trials=args.eval_trials)
            m["mAP"] = mAP
            if ckpt and ckpt.save_best(mAP, state):
                print(f"epoch {epoch}: new best mAP {mAP:.4f}", flush=True)
    if ckpt:
        ckpt.save_last(state)
    return m


def build_argparser():
    p = argparse.ArgumentParser(description="Deep adaptive trainer (TPU)")
    p.add_argument("--path", type=str, default="")
    p.add_argument("--epoch", type=int, default=560)
    p.add_argument("--steps", type=int, default=0)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--num_pos", type=int, default=4)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--lr_reid", type=float, default=3e-4)
    p.add_argument("--arch", type=str, default="resnet18")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--sample_dir", type=str, default="",
                   help="dump sample grids here (reference sample-deep-transfer/)")
    p.add_argument("--sample_every", type=int, default=500)
    p.add_argument("--ckpt_dir", type=str, default="")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--eval_every", type=int, default=0,
                   help="validate CMC/mAP every N epochs (reference: 4)")
    p.add_argument("--eval_path", type=str, default="",
                   help="raw SYSU-MM01 root (cam1..cam6 + exp/test_id.txt)")
    p.add_argument("--eval_trials", type=int, default=1)
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
