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

Three deliberate deviations from the reference, each fixing a measured
instability of its adversarial game (round-3 on-chip run: D saturated at BCE
~1e-4 by step 600, cycle flat at ~2.0 from step 1200, feat hinge 2.1e14 at
step 8):

1. **Luminance-space discriminator.**  Inputs are ImageNet-normalized
   per-channel, so a real IR image has three *deterministically different*
   channels while every fake is a 1-channel generator output repeated ×3
   (reference ``generateInters``, ``:148-152`` — same ``expand``).  The
   reference discriminator (``train_d``, ``:154-171``) can therefore win on
   channel statistics alone, ignoring content.  Here D sees the channel-mean
   of real images (the same luminance space the cycle targets already live
   in, ``train_cycle_rec:176-180``), removing the trivial tell.
2. **Consistent domain heads.**  The reference trains D with fakes on heads
   ``1-y`` (``train_d``, ``:164-165``) but the generator maximizes realness
   on heads ``y`` (``train_cycle_rec``, ``:205-208``) — G and D play on
   *different* output heads, so G's adversarial gradient never opposes what
   D learned.  Here the generator uses the same ``1-y`` heads D scores
   fakes on.
3. **Normalized center-margin features.**  The hinge (``:192-200``) squares
   raw backbone features; at init these are O(1e3-1e7) per dim and the loss
   reaches 1e14.  Here the features are L2-normalized first, making
   pos/neg O(1) at every step (margin unchanged at 0.01).

A fourth, reference-*faithful* detail matters for init stability: the
person_id pass over the translations runs ``train=True`` (batch-stat BN),
because the reference keeps the whole model in train mode during
``train_cycle_rec``.  With eval-mode running stats a fresh generator's
out-of-distribution outputs drive the id CE to O(1e7) for the first ~50
steps (measured); batch-stat BN renormalizes any input scale so every loss
is O(1) from step 1.  The BN stats mutated by that pass are discarded.

The D/G balance knobs (``r1_weight``, ``adv_weight``, ``d_every``) enter the
step as *traced scalars*, so retuning them never recompiles the graph
(remote TPU compiles of this trainer take tens of minutes).
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


def make_loss_fns(model: ModelStarGAN, num_pos: int):
    """The three per-step objectives (reid / generator / discriminator) as
    pure functions — shared by :func:`make_train_step` and the phase
    decomposition in ``scripts/mfu_profile.py --stargan``."""
    ce = lambda lg, lb: optax.softmax_cross_entropy_with_integer_labels(
        lg, lb).mean()
    mse = lambda a, b: jnp.mean(jnp.square(a - b))

    def e3(x):
        return jnp.repeat(x, 3, axis=-1) if x.shape[-1] == 1 else x

    def lum(x):
        """Channel-mean ×3 — the luminance space D operates in (deviation #1
        in the module docstring)."""
        return jnp.repeat(jnp.mean(x, axis=-1, keepdims=True), 3, axis=-1)

    def l2n(f):
        return f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-12)

    def person_feats(params, cols, batch, train, rng):
        variables = {"params": params, **cols}

        def fwd(m):
            return m.person_id(xRGB=batch["aug_rgb"], xIR=batch["aug_ir"],
                               modal=0, with_feature=True, train=train)

        (feat, score, *_), new_vars = model.apply(
            variables, method=lambda m: fwd(m), mutable=["batch_stats"],
            rngs={"dropout": rng})
        return feat, score, new_vars

    def disc_loss_fn(disc_params, other_params, cols, gray, ir, g2i, i2g,
                     r1_weight, with_r1: bool = True):
        params = {**jax.tree_util.tree_map(jax.lax.stop_gradient, other_params),
                  **disc_params}
        variables = {"params": params, **cols}
        bs = gray.shape[0]
        y = jnp.concatenate([jnp.ones((bs,), jnp.int32),
                             jnp.zeros((bs,), jnp.int32)])
        # D judges luminance (deviation #1): real images enter channel-mean'd
        # so the per-channel ImageNet normalization can't give fakes away.
        x_real = jnp.concatenate([lum(gray), lum(ir)], axis=0)

        def d_real_sum(x):
            return jnp.sum(model.apply(variables, x, y,
                                       method=model.discriminate))

        out_real = model.apply(variables, x_real, y, method=model.discriminate)
        loss_real = adv_loss(out_real, 1)
        # R1: 0.5·E[‖∇ₓD(x)‖²] (reference r1_reg, :131-141); weight traced.
        # ``with_r1`` is a STATIC switch for the profiler (r1_weight being
        # traced means XLA can never DCE the nested grad) — trainer always
        # passes the default True.
        if with_r1:
            grad_x = jax.grad(d_real_sum)(x_real)
            r1 = 0.5 * jnp.mean(jnp.sum(jnp.square(
                grad_x.reshape(2 * bs, -1)), axis=1))
        else:
            r1 = jnp.zeros(())

        x_fake = jnp.concatenate([g2i, i2g], axis=0)
        out_fake = model.apply(variables, x_fake, 1 - y,
                               method=model.discriminate)
        loss_fake = adv_loss(out_fake, 0)
        return loss_real + loss_fake + r1_weight * r1, (loss_real, loss_fake,
                                                        r1)

    def gen_loss_fn(gen_params, frozen, cols, batch, featV, featI, adv_weight,
                    rng):
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
            # train=True: the reference runs the whole model in train mode
            # here, so BN normalizes with *batch* stats — with eval-mode
            # running stats (init: mean 0 / var 1) the out-of-distribution
            # fakes of a fresh generator drive the logits to O(1e7) and the
            # id CE to 1e7 at step 8 (round-4 run gan_loss_r4.csv).  The
            # mutated stats are discarded (new_vars below), so the reid
            # net's running statistics never see generator outputs.
            fake_feat, fake_score, *_ = m.person_id(
                xRGB=i2g, xIR=g2i, modal=0, with_feature=True, train=True)
            y = jnp.concatenate([jnp.ones((bs,), jnp.int32),
                                 jnp.zeros((bs,), jnp.int32)])
            # deviation #2: fool the SAME heads D scores fakes on (1-y) —
            # the reference's y here never opposes train_d's 1-y.
            d_fake = m.discriminate(jnp.concatenate([g2i, i2g], 0), 1 - y)
            return g2i, i2g, g2i2g, i2g2i, fake_feat, fake_score, d_fake

        (g2i, i2g, g2i2g, i2g2i, fake_feat, fake_score, d_fake), new_vars = \
            model.apply(variables, method=lambda m: fwd(m),
                        mutable=["batch_stats"], rngs={"dropout": rng})

        gray_t = jnp.mean(gray, -1, keepdims=True).repeat(3, -1)
        ir_t = jnp.mean(ir, -1, keepdims=True).repeat(3, -1)
        cycle = mse(i2g2i, ir_t) + mse(g2i2g, gray_t)

        labels = jnp.concatenate([labels1, labels1], 0)
        loss_id_ir = ce(fake_score, labels)
        # deviation #3: hinge over L2-normalized features — pos/neg O(1)
        fv, fi = jnp.split(l2n(fake_feat), 2, axis=0)
        n = bs // num_pos
        center = lambda f: f.reshape(n, num_pos, -1).mean(axis=1)
        pos = jnp.mean(jnp.square(center(fv) - center(fi)), axis=1)
        neg = jnp.mean(jnp.square(
            center(l2n(jax.lax.stop_gradient(featV)))
            - center(l2n(jax.lax.stop_gradient(featI)))), axis=1)
        feat_ir = jnp.mean(jnp.maximum(0.0, 0.01 + pos - neg))
        disc_fake = adv_loss(d_fake, 1)

        total = cycle + 0.5 * (loss_id_ir + feat_ir) + adv_weight * disc_fake
        metrics = {"cycle": cycle, "id_ir": loss_id_ir, "feat_ir": feat_ir,
                   "g_adv": disc_fake, "hinge_pos": jnp.mean(pos),
                   "hinge_neg": jnp.mean(neg)}
        return total, (metrics, g2i, i2g)

    def reid_loss_fn(reid_params, frozen, cols, batch, rng):
        params = {**jax.tree_util.tree_map(jax.lax.stop_gradient, frozen),
                  **reid_params}
        feat, score, new_vars = person_feats(params, cols, batch, True, rng)
        labels1 = batch["label"]
        labels = jnp.concatenate([labels1, labels1], 0)
        fv, fi = jnp.split(feat, 2, axis=0)
        loss = ce(score, labels) + L.triplet_loss_wrt(fv, labels1)[0] \
            + L.triplet_loss_wrt(fi, labels1)[0]
        return loss, (feat, new_vars["batch_stats"])

    return reid_loss_fn, gen_loss_fn, disc_loss_fn


def make_train_step(model: ModelStarGAN, tx_reid, tx_gen, tx_disc,
                    num_pos: int):
    reid_loss_fn, gen_loss_fn, disc_loss_fn = make_loss_fns(model, num_pos)

    # Donate the state: params/opt/EMA buffers are rewritten in place,
    # halving peak HBM for the step (XLA aliases in->out buffers).
    # ``knobs`` (optional) carries traced balance scalars — r1_weight,
    # adv_weight, d_mask (1.0 = update D this step) — so retuning the D/G
    # balance reuses the compiled graph.
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: GanState, batch, rng, knobs=None):
        kn = knobs or {}
        r1_weight = kn.get("r1_weight", 1.0)
        adv_weight = kn.get("adv_weight", 0.5)
        d_mask = kn.get("d_mask", 1.0)
        rng = jax.random.fold_in(rng, state.step)
        reid_params, gen_params, disc_params = _split(state.params)
        cols = {"batch_stats": state.batch_stats}

        # reid step (also yields the style features)
        (loss_re, (feat, batch_stats)), reid_grads = jax.value_and_grad(
            reid_loss_fn, has_aux=True)(
            reid_params, {**gen_params, **disc_params}, cols, batch,
            jax.random.fold_in(rng, 0))
        upd, opt_reid = tx_reid.update(reid_grads, state.opt_reid, reid_params)
        reid_params = optax.apply_updates(reid_params, upd)
        featV, featI = jnp.split(jax.lax.stop_gradient(feat), 2, axis=0)
        cols = {"batch_stats": batch_stats}

        # generator step
        (loss_g, (metrics, g2i, i2g)), gen_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(
            gen_params, {**reid_params, **disc_params}, cols, batch,
            featV, featI, adv_weight, jax.random.fold_in(rng, 1))
        upd, opt_gen = tx_gen.update(gen_grads, state.opt_gen, gen_params)
        gen_params = optax.apply_updates(gen_params, upd)

        # discriminator step on detached translations (masked out on
        # non-``d_every`` steps — lazy-D cadence without a second graph)
        (loss_d, (d_real, d_fake, r1)), disc_grads = jax.value_and_grad(
            disc_loss_fn, has_aux=True)(
            disc_params, {**reid_params, **gen_params}, cols,
            batch["gray"], batch["ir"],
            jax.lax.stop_gradient(g2i), jax.lax.stop_gradient(i2g), r1_weight)
        upd, opt_disc_new = tx_disc.update(disc_grads, state.opt_disc,
                                           disc_params)
        disc_new = optax.apply_updates(disc_params, upd)
        take = lambda a, b: jax.tree_util.tree_map(
            lambda x, y: jnp.where(d_mask > 0, x, y), a, b)
        disc_params = take(disc_new, disc_params)
        opt_disc = take(opt_disc_new, state.opt_disc)

        metrics = {**metrics, "loss_reid": loss_re, "loss_gen": loss_g,
                   "loss_disc": loss_d, "d_real": d_real, "d_fake": d_fake,
                   "r1": r1}
        return state.replace(
            step=state.step + 1,
            params={**gen_params, **reid_params, **disc_params},
            batch_stats=batch_stats, opt_reid=opt_reid, opt_gen=opt_gen,
            opt_disc=opt_disc), metrics

    return train_step


def build_idpres_set(dataset: SYSUData, max_ids: int = 32, seed: int = 0,
                     trials: int = 5):
    """Probe sets for the identity-preservation metric: per identity one gray
    query source (instance a), one style-donor IR (instance b) and one gallery
    IR (instance c ≠ b, so the style vector can't leak gallery appearance).
    Images leave ImageNet-normalized like the train batches.

    ``trials`` independent (a, b, c) draws per identity (the SYSU protocol's
    multi-trial gallery resampling, ``eval/reid.py::validate``): a single
    16-probe single-gallery draw carries ~±0.1 eval noise — the entire signal
    the round-4 run claimed (VERDICT r4 weak #5) — so the logged metric is
    the mean over ``trials`` resampled galleries."""
    from vqvae2_tpu.data.sysu import imagenet_normalize

    rng = np.random.default_rng(seed)
    ids = np.unique(dataset.train_color_label)[:max_ids]
    out = []
    for _ in range(max(trials, 1)):
        grays, styles, gals, labels = [], [], [], []
        for pid in ids:
            ci = np.flatnonzero(dataset.train_color_label == pid)
            ti = np.flatnonzero(dataset.train_ir_label == pid)
            if len(ci) == 0 or len(ti) == 0:
                continue
            a = rng.choice(ci)
            b, c = (rng.choice(ti, size=2, replace=False) if len(ti) >= 2
                    else (ti[0], ti[0]))
            rgb = imagenet_normalize(dataset.train_color_image[a])
            grays.append(np.repeat(rgb.mean(axis=-1, keepdims=True), 3,
                                   axis=-1))
            styles.append(imagenet_normalize(dataset.train_ir_image[b]))
            gals.append(imagenet_normalize(dataset.train_ir_image[c]))
            labels.append(pid)
        out.append((np.stack(grays).astype(np.float32),
                    np.stack(styles).astype(np.float32),
                    np.stack(gals).astype(np.float32),
                    np.asarray(labels, np.int64)))
    return out


def make_idpres_eval(model: ModelStarGAN):
    """Frozen-reid identity-preservation mAP — the quantitative translation
    metric for the fork's actual goal (cross-modal ReID): translate the gray
    probes to IR, extract L2-normalized IR-path features with the *frozen*
    person_id net, and rank them against real-IR gallery features.  mAP rises
    iff the translations preserve identity as seen by the reid net."""

    def e3(x):
        return jnp.repeat(x, 3, axis=-1) if x.shape[-1] == 1 else x

    @jax.jit
    def feats(params, batch_stats, gray_q, ir_style, ir_gal):
        variables = {"params": params, "batch_stats": batch_stats}

        def fwd(m):
            style, *_ = m.person_id(xIR=ir_style, modal=2, with_feature=True,
                                    train=False)
            g2i = e3(m.gen_1(gray_q, style))
            qf = m.person_id(xIR=g2i, modal=2, train=False)[1]
            gf = m.person_id(xIR=ir_gal, modal=2, train=False)[1]
            return qf.astype(jnp.float32), gf.astype(jnp.float32)

        return model.apply(variables, method=lambda m: fwd(m))

    def evaluate(state: GanState, probe_sets) -> float:
        from vqvae2_tpu.eval.reid import cosine_distmat, eval_sysu

        # mean over independent probe/gallery draws (all trials share one
        # jitted program — identical shapes)
        maps = []
        for gray_q, ir_style, ir_gal, labels in probe_sets:
            qf, gf = feats(state.params, state.batch_stats,
                           jnp.asarray(gray_q), jnp.asarray(ir_style),
                           jnp.asarray(ir_gal))
            _, mAP, _ = eval_sysu(
                cosine_distmat(np.asarray(qf), np.asarray(gf)),
                labels, labels)
            maps.append(mAP)
        return float(np.mean(maps))

    return evaluate


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
    # checkpoint/resume: the reference saves the whole StarGAN ensemble per
    # epoch (train_vqvae_deep_bi2.py epoch loop); same periodic/last/best
    # layout as the sibling trainers (utils/checkpoint.py)
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
    step_fn = make_train_step(model, tx_reid, tx_gen, tx_disc, args.num_pos)
    sample_fn = make_sample_fn(model) if args.sample_dir else None
    idpres = (make_idpres_eval(model),
              build_idpres_set(dataset, seed=args.seed,
                               trials=args.idpres_trials)
              ) if args.eval_every else None
    rng = jax.random.PRNGKey(args.seed + 2)
    host_rng = np.random.default_rng(args.seed)

    from vqvae2_tpu.utils.metrics import CsvLogger

    csv = CsvLogger(args.metrics_csv)
    map_csv = CsvLogger(args.map_csv)
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
            knobs = {
                "r1_weight": jnp.float32(args.r1_weight),
                "adv_weight": jnp.float32(args.adv_weight),
                "d_mask": jnp.float32(1.0 if n_done % args.d_every == 0
                                      else 0.0),
            }
            state, metrics = step_fn(state, batch, rng, knobs)
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
            if (idpres is not None and n_done % args.eval_every == 0
                    and par.is_primary()):
                mAP = idpres[0](state, idpres[1])
                m["idpres_map"] = mAP
                map_csv.log(n_done, {"idpres_map": mAP})
                print(f"step {n_done}: identity-preservation mAP {mAP:.4f}",
                      flush=True)
                if ckpt and ckpt.save_best(mAP, state):
                    print(f"step {n_done}: new best idpres mAP {mAP:.4f}",
                          flush=True)
            if ckpt and args.save_every and n_done % args.save_every == 0:
                ckpt.save_periodic(n_done, state)
            if n_done >= total_steps:
                break
    if ckpt:
        ckpt.save_last(state)
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
    p.add_argument("--r1_weight", type=float, default=1.0,
                   help="R1 gradient-penalty weight (traced — no recompile)")
    p.add_argument("--adv_weight", type=float, default=0.5,
                   help="generator adversarial-loss weight (reference: 0.5)")
    p.add_argument("--d_every", type=int, default=1,
                   help="update the discriminator every N steps (lazy-D)")
    p.add_argument("--eval_every", type=int, default=0,
                   help="compute frozen-reid identity-preservation mAP every "
                        "N steps")
    p.add_argument("--idpres_trials", type=int, default=5,
                   help="independent probe/gallery draws averaged per idpres "
                        "eval (single-draw noise is ~±0.1 at 16 ids)")
    p.add_argument("--ckpt_dir", type=str, default="",
                   help="periodic/last/best-idpres checkpoints (off if empty)")
    p.add_argument("--save_every", type=int, default=0,
                   help="periodic checkpoint cadence in steps (0 = last/best only)")
    p.add_argument("--resume", action="store_true",
                   help="restore the latest step_*/last checkpoint from --ckpt_dir")
    p.add_argument("--map_csv", type=str, default="",
                   help="append (step, idpres_map) rows to this CSV")
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
