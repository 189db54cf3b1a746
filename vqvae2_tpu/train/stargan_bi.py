"""StarGAN-v2 bidirectional trainer — TPU rebuild of reference
``train_vqvae_deep_bi2.py``: the bi cycle re-based on StarGAN-v2 generators
with an image-level multi-domain discriminator, adversarial BCE and the R1
zero-centered gradient penalty.

Per batch (reference ``:148-290``):
* translate gray→IR (gen_1) and IR→gray (gen_2), styles = person features
  through the mapping network;
* **discriminator step** (Adam #3): BCE real=1 on (gray, ir) with domain
  labels (1,0), R1 penalty on real inputs (``r1_reg``, ``:131-141`` — here a
  nested ``jax.grad`` through the discriminator), BCE fake=0 on translations
  with flipped domains (``train_d``, ``:154-171``);
* **generator step**: cycle MSE against channel-mean targets + 0.5·(translated
  id CE + center-margin feature loss + BCE(fake→1)) (``train_cycle_rec``,
  ``:174-218``);
* **ReID step**: id CE + WRT self-triplets on augmented real views.
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
from vqvae2_tpu.models.stargan import ModelStarGAN
from vqvae2_tpu.train.vqvae_deep_bi import aug_transforms


def adv_loss(logits: jax.Array, target: int) -> jax.Array:
    """BCE-with-logits against a constant target (reference ``adv_loss``,
    train_vqvae_deep_bi2.py:143-147)."""
    t = jnp.full_like(logits, float(target))
    return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, t))


def _generator_img_size(h: int, w: int) -> int:
    """Largest ``img_size`` whose hourglass divides (h, w) exactly.

    The Generator with ``w_hpf=1`` runs ``log2(img_size) - 3`` stride-2
    stages, so both sides must be divisible by ``2**(log2(img_size) - 3)``
    or the decoder returns a wrong-width image (stride-2 SAME floors the odd
    side on the way down and doubling misses it on the way up).  At SYSU
    geometry (288×144) this picks 128 — exactly the reference's hardcoded
    ``Generator(256//2)`` (starGAN/model.py:318-319).
    """
    twos = min((h & -h).bit_length(), (w & -w).bit_length()) - 1
    return min(1 << int(np.log2(max(h, w))), 1 << (twos + 3))


class GanState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_reid: Any
    opt_gen: Any
    opt_disc: Any


def _split(params):
    reid = {"person_id": params["person_id"]}
    disc = {"discriminator": params["discriminator"]}
    gen = {k: v for k, v in params.items()
           if k not in ("person_id", "discriminator")}
    return reid, gen, disc


def make_train_step(model: ModelStarGAN, tx_reid, tx_gen, tx_disc,
                    num_pos: int):
    ce = lambda lg, lb: optax.softmax_cross_entropy_with_integer_labels(
        lg, lb).mean()
    mse = lambda a, b: jnp.mean(jnp.square(a - b))

    def e3(x):
        return jnp.repeat(x, 3, axis=-1) if x.shape[-1] == 1 else x

    def person_feats(params, cols, batch, train):
        variables = {"params": params, **cols}

        def fwd(m):
            return m.person_id(xRGB=batch["aug_rgb"], xIR=batch["aug_ir"],
                               modal=0, with_feature=True, train=train)

        (feat, score, *_), new_vars = model.apply(
            variables, method=lambda m: fwd(m), mutable=["batch_stats"])
        return feat, score, new_vars

    def translations(params, cols, gray, ir, featV, featI):
        variables = {"params": params, **cols}

        def fwd(m):
            return e3(m.gen_1(gray, featI)), e3(m.gen_2(ir, featV))

        (g2i, i2g), _ = model.apply(variables, method=lambda m: fwd(m),
                                    mutable=["batch_stats"])
        return g2i, i2g

    def disc_loss_fn(disc_params, other_params, cols, gray, ir, g2i, i2g):
        params = {**jax.tree_util.tree_map(jax.lax.stop_gradient, other_params),
                  **disc_params}
        variables = {"params": params, **cols}
        bs = gray.shape[0]
        y = jnp.concatenate([jnp.ones((bs,), jnp.int32),
                             jnp.zeros((bs,), jnp.int32)])
        x_real = jnp.concatenate([gray, ir], axis=0)

        def d_real_sum(x):
            return jnp.sum(model.apply(variables, x, y,
                                       method=model.discriminate))

        out_real = model.apply(variables, x_real, y, method=model.discriminate)
        loss_real = adv_loss(out_real, 1)
        # R1: 0.5·E[‖∇ₓD(x)‖²] (reference r1_reg, :131-141)
        grad_x = jax.grad(d_real_sum)(x_real)
        r1 = 0.5 * jnp.mean(jnp.sum(jnp.square(
            grad_x.reshape(2 * bs, -1)), axis=1))

        x_fake = jnp.concatenate([g2i, i2g], axis=0)
        out_fake = model.apply(variables, x_fake, 1 - y,
                               method=model.discriminate)
        loss_fake = adv_loss(out_fake, 0)
        return loss_real + loss_fake + r1, (loss_real, loss_fake, r1)

    def gen_loss_fn(gen_params, frozen, cols, batch, featV, featI):
        params = {**jax.tree_util.tree_map(jax.lax.stop_gradient, frozen),
                  **gen_params}
        variables = {"params": params, **cols}
        gray, ir, labels1 = batch["gray"], batch["ir"], batch["label"]
        bs = gray.shape[0]

        def fwd(m):
            g2i = e3(m.gen_1(gray, featI))
            i2g = e3(m.gen_2(ir, featV))
            g2i2g = e3(m.gen_2(g2i, featV))
            i2g2i = e3(m.gen_1(i2g, featI))
            fake_feat, fake_score, *_ = m.person_id(
                xRGB=i2g, xIR=g2i, modal=0, with_feature=True, train=False)
            y = jnp.concatenate([jnp.ones((bs,), jnp.int32),
                                 jnp.zeros((bs,), jnp.int32)])
            d_fake = m.discriminate(jnp.concatenate([g2i, i2g], 0), y)
            return g2i, i2g, g2i2g, i2g2i, fake_feat, fake_score, d_fake

        (g2i, i2g, g2i2g, i2g2i, fake_feat, fake_score, d_fake), new_vars = \
            model.apply(variables, method=lambda m: fwd(m),
                        mutable=["batch_stats"])

        gray_t = jnp.mean(gray, -1, keepdims=True).repeat(3, -1)
        ir_t = jnp.mean(ir, -1, keepdims=True).repeat(3, -1)
        cycle = mse(i2g2i, ir_t) + mse(g2i2g, gray_t)

        labels = jnp.concatenate([labels1, labels1], 0)
        loss_id_ir = ce(fake_score, labels)
        fv, fi = jnp.split(fake_feat, 2, axis=0)
        n = bs // num_pos
        center = lambda f: f.reshape(n, num_pos, -1).mean(axis=1)
        pos = jnp.mean(jnp.square(center(fv) - center(fi)), axis=1)
        neg = jnp.mean(jnp.square(
            center(jax.lax.stop_gradient(featV))
            - center(jax.lax.stop_gradient(featI))), axis=1)
        feat_ir = jnp.mean(jnp.maximum(0.0, 0.01 + pos - neg))
        disc_fake = adv_loss(d_fake, 1)

        total = cycle + 0.5 * (loss_id_ir + feat_ir + disc_fake)
        metrics = {"cycle": cycle, "id_ir": loss_id_ir, "feat_ir": feat_ir,
                   "g_adv": disc_fake}
        return total, (metrics, g2i, i2g)

    def reid_loss_fn(reid_params, frozen, cols, batch):
        params = {**jax.tree_util.tree_map(jax.lax.stop_gradient, frozen),
                  **reid_params}
        feat, score, new_vars = person_feats(params, cols, batch, True)
        labels1 = batch["label"]
        labels = jnp.concatenate([labels1, labels1], 0)
        fv, fi = jnp.split(feat, 2, axis=0)
        loss = ce(score, labels) + L.triplet_loss_wrt(fv, labels1)[0] \
            + L.triplet_loss_wrt(fi, labels1)[0]
        return loss, (feat, new_vars["batch_stats"])

    # Donate the state: params/opt/EMA buffers are rewritten in place,
    # halving peak HBM for the step (XLA aliases in->out buffers).
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: GanState, batch, rng):
        reid_params, gen_params, disc_params = _split(state.params)
        cols = {"batch_stats": state.batch_stats}

        # reid step (also yields the style features)
        (loss_re, (feat, batch_stats)), reid_grads = jax.value_and_grad(
            reid_loss_fn, has_aux=True)(
            reid_params, {**gen_params, **disc_params}, cols, batch)
        upd, opt_reid = tx_reid.update(reid_grads, state.opt_reid, reid_params)
        reid_params = optax.apply_updates(reid_params, upd)
        featV, featI = jnp.split(jax.lax.stop_gradient(feat), 2, axis=0)
        cols = {"batch_stats": batch_stats}

        # generator step
        (loss_g, (metrics, g2i, i2g)), gen_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(
            gen_params, {**reid_params, **disc_params}, cols, batch,
            featV, featI)
        upd, opt_gen = tx_gen.update(gen_grads, state.opt_gen, gen_params)
        gen_params = optax.apply_updates(gen_params, upd)

        # discriminator step on detached translations
        (loss_d, (d_real, d_fake, r1)), disc_grads = jax.value_and_grad(
            disc_loss_fn, has_aux=True)(
            disc_params, {**reid_params, **gen_params}, cols,
            batch["gray"], batch["ir"],
            jax.lax.stop_gradient(g2i), jax.lax.stop_gradient(i2g))
        upd, opt_disc = tx_disc.update(disc_grads, state.opt_disc, disc_params)
        disc_params = optax.apply_updates(disc_params, upd)

        metrics = {**metrics, "loss_reid": loss_re, "loss_gen": loss_g,
                   "loss_disc": loss_d, "d_real": d_real, "d_fake": d_fake,
                   "r1": r1}
        return state.replace(
            step=state.step + 1,
            params={**gen_params, **reid_params, **disc_params},
            batch_stats=batch_stats, opt_reid=opt_reid, opt_gen=opt_gen,
            opt_disc=opt_disc), metrics

    return train_step


def make_sample_fn(model: ModelStarGAN):
    """Eval-mode translation pass for sample grids: style features from the
    un-augmented pair (BN running stats, no mutation), then both generators."""

    def e3(x):
        return jnp.repeat(x, 3, axis=-1) if x.shape[-1] == 1 else x

    @jax.jit
    def sample(params, batch_stats, batch):
        variables = {"params": params, "batch_stats": batch_stats}

        def fwd(m):
            feat, *_ = m.person_id(xRGB=batch["gray"], xIR=batch["ir"],
                                   modal=0, with_feature=True, train=False)
            fv, fi = jnp.split(feat, 2, axis=0)
            return (e3(m.gen_1(batch["gray"], fi)),
                    e3(m.gen_2(batch["ir"], fv)))

        return model.apply(variables, method=lambda m: fwd(m))

    return sample


def dump_samples(sample_fn, state: GanState, batch, path: str,
                 max_rows: int = 8) -> None:
    """Grid rows = [gray input, gray→IR, real IR, IR→gray] — the translation
    panel of reference ``train_vqvae_deep_bi2.py`` (its per-epoch image dump)."""
    from vqvae2_tpu.utils.image import save_image

    g2i, i2g = sample_fn(state.params, state.batch_stats, batch)
    k = min(int(batch["ir"].shape[0]), max_rows)
    take = lambda x: np.asarray(x)[:k]
    grid = np.concatenate([take(batch["gray"]), take(g2i),
                           take(batch["ir"]), take(i2g)], axis=0)
    save_image(grid, path, nrow=k)


def train(args):
    mesh = par.default_mesh()
    dataset = SYSUData(args.path, part=False, seed=args.seed)
    loader_batch = args.batch_size * args.num_pos
    steps_per_epoch = max(len(dataset) // loader_batch, 1)
    total_steps = args.steps or steps_per_epoch * args.epoch

    h, w = dataset.train_color_image.shape[1:3]
    model = ModelStarGAN(class_num=dataset.num_class, arch=args.arch,
                         img_size=_generator_img_size(h, w))
    tx_reid = optax.sgd(args.lr_F, momentum=0.9, nesterov=True)
    tx_gen = optax.adam(args.lr)
    tx_disc = optax.adam(args.lr_disc)

    probe = jnp.zeros((2 * args.num_pos, h, w, 3), jnp.float32)

    def init_probe(module):
        feat, *_ = module.person_id(xRGB=probe, xIR=probe, modal=0,
                                    with_feature=True)
        fv, fi = jnp.split(feat, 2, axis=0)
        g2i = module.gen_1(probe, fi)
        i2g = module.gen_2(probe, fv)
        y = jnp.zeros((probe.shape[0],), jnp.int32)
        return module.discriminate(probe, y)

    variables = model.init(
        {"params": jax.random.PRNGKey(args.seed),
         "dropout": jax.random.PRNGKey(1)}, method=init_probe)
    reid_params, gen_params, disc_params = _split(variables["params"])
    state = GanState(step=jnp.zeros((), jnp.int32),
                     params=variables["params"],
                     batch_stats=variables.get("batch_stats", {}),
                     opt_reid=tx_reid.init(reid_params),
                     opt_gen=tx_gen.init(gen_params),
                     opt_disc=tx_disc.init(disc_params))
    state = par.replicate(state, mesh)
    step_fn = make_train_step(model, tx_reid, tx_gen, tx_disc, args.num_pos)
    sample_fn = make_sample_fn(model) if args.sample_dir else None
    rng = jax.random.PRNGKey(args.seed + 2)
    host_rng = np.random.default_rng(args.seed)

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
                "gray": gray, "ir": ir,
                "aug_rgb": aug_transforms(rgb, host_rng),
                "aug_ir": aug_transforms(ir, host_rng),
                "label": np.asarray([r[2] for r in rows], np.int32),
            }, mesh)
            state, metrics = step_fn(state, batch, rng)
            n_done += 1
            if n_done % args.log_every == 0 and par.is_primary():
                m = par.reduce_dict(metrics)
                print(f"step {n_done}/{total_steps} gen {m['loss_gen']:.3f} "
                      f"disc {m['loss_disc']:.3f} reid {m['loss_reid']:.3f} "
                      f"cycle {m['cycle']:.4f} r1 {m['r1']:.4f}", flush=True)
                csv.log(n_done, m)
            if (sample_fn is not None and n_done % args.sample_every == 0
                    and par.is_primary()):
                dump_samples(sample_fn, state, batch,
                             f"{args.sample_dir}/{n_done:05d}.png")
            if n_done >= total_steps:
                break
    return m


def build_argparser():
    p = argparse.ArgumentParser(description="StarGAN-v2 bidirectional trainer (TPU)")
    p.add_argument("--path", type=str, default="")
    p.add_argument("--epoch", type=int, default=200)
    p.add_argument("--steps", type=int, default=0)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--num_pos", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lr_disc", type=float, default=1e-4)
    p.add_argument("--lr_F", type=float, default=0.1)
    p.add_argument("--arch", type=str, default="resnet18")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--sample_dir", type=str, default="",
                   help="dump [gray, gray→IR, IR, IR→gray] grids here")
    p.add_argument("--sample_every", type=int, default=500)
    p.add_argument("--metrics_csv", type=str, default="",
                   help="append per-log-step scalars to this CSV (loss curves)")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if args.synthetic:
        import tempfile

        from vqvae2_tpu.train.reid import make_synthetic_sysu

        args.path = make_synthetic_sysu(tempfile.mkdtemp(prefix="sysu_syn_"),
                                        h=64, w=64)
    return par.launch(train, args)


if __name__ == "__main__":
    main()
