"""Per-phase MFU / roofline accounting for the flagship stage-1 paths.

Answers "is the bf16 gap headroom or a layout bug?" with numbers: each phase
(bottom/top encoder, quantizers, decoder, full encode, full train step) is
timed on the real chip with the LICM-proofed in-jit loop (CLAUDE.md), FLOPs
and HBM bytes come from XLA's own cost model (``compiled.cost_analysis()``),
and the table reports achieved TFLOP/s against v5e peak (197 bf16 TFLOP/s —
fp32 matmuls run through the same MXU at roughly 1/4 via 3-pass splitting)
plus achieved GB/s against the 819 GB/s HBM roofline.

Usage: python scripts/mfu_profile.py [--batch 128] [--train_batch 8] [--iters 60]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK_BF16 = 197e12     # TFLOP/s, bf16 MXU
V5E_PEAK_HBM = 819e9       # B/s


def timed_loop(fn, args, n_iter: int):
    """Best-of-3 wall time of ``n_iter`` in-jit iterations of ``fn``.

    The loop body carries a data dependence on the carry (1e-12 input
    perturbation) — without it XLA's while-loop LICM hoists the whole
    computation and you time ONE iteration (CLAUDE.md)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*a):
        def body(i, carry):
            acc, eps = carry
            out = fn(*a[:-1], a[-1] + eps)
            # consume EVERY output leaf — an unconsumed leaf lets XLA DCE the
            # ops feeding it (e.g. the whole optimizer update)
            s = sum(jnp.sum(l.astype(jnp.float32))
                    for l in jax.tree_util.tree_leaves(out))
            return acc + s, (s % 3.0) * 1e-12
        acc, _ = jax.lax.fori_loop(
            0, n_iter, body, (jnp.zeros((), jnp.float32),
                              jnp.zeros((), jnp.float32)))
        return acc

    float(run(*args))  # compile + warm (1st exec pays one-off upload cost)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best / n_iter


def cost_of(fn, args):
    """XLA cost-model FLOPs + HBM bytes for ONE call of ``fn``."""
    import jax

    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_ = float(ca.get("bytes accessed", 0.0))
    return flops, bytes_


def profile_phase(name, fn, args, n_iter, rows):
    sec = timed_loop(fn, args, n_iter)
    flops, bytes_ = cost_of(fn, args)
    tflops = flops / sec / 1e12
    gbs = bytes_ / sec / 1e9
    rows.append((name, sec * 1e3, flops / 1e9, tflops,
                 100.0 * tflops * 1e12 / V5E_PEAK_BF16, gbs,
                 100.0 * gbs * 1e9 / V5E_PEAK_HBM))


def print_table(all_rows):
    print(f"\n| phase | ms/iter | GFLOP | TFLOP/s | %bf16-peak | GB/s | %HBM |")
    print("|---|---|---|---|---|---|---|")
    for dname, rows in all_rows.items():
        for (name, ms, gflop, tflops, pk, gbs, hbm) in rows:
            print(f"| {name} | {ms:.2f} | {gflop:.1f} | {tflops:.1f} | "
                  f"{pk:.0f}% | {gbs:.0f} | {hbm:.0f}% |")


def profile_reid(args):
    """Decompose the flagship ReID + part-parsing step (reference hot loop
    ``train_reid.py:44-194``): 3-modality backbone+part forward, the loss
    tail (parsing criterion / Lovasz sort / InfoNCE / triplets), backward,
    and the SGD update — fp32 vs bf16 — to locate the binding resource
    (VERDICT r3: 2,121 ms/step, bf16 buys 3%, unexplained)."""
    import jax
    import jax.numpy as jnp

    from vqvae2_tpu.part import criterion as C
    from vqvae2_tpu.part.part_model import EmbedNet2
    from vqvae2_tpu.train.reid import (ReidState, make_optimizer,
                                       make_train_step)

    n_ids, num_pos, hw = args.reid_ids, 4, (288, 144)
    rows_total = n_ids * num_pos
    print(f"backend: {jax.default_backend()}  reid step P{n_ids}xK{num_pos} "
          f"({rows_total} rows x3 modalities, {hw[0]}x{hw[1]}, "
          f"arch={args.reid_arch})", flush=True)
    rngd = np.random.default_rng(0)
    imgs = lambda: jnp.asarray(
        rngd.normal(size=(rows_total, *hw, 3)).astype(np.float32))
    parts = lambda: jnp.asarray(
        rngd.integers(0, 7, size=(rows_total, *hw)).astype(np.int32))
    batch = {"rgb": imgs(), "ir": imgs(), "gray": imgs(),
             "label": jnp.asarray(np.repeat(np.arange(n_ids, dtype=np.int32),
                                            num_pos)),
             "part1": parts(), "part2": parts()}

    all_rows = {}
    for dtype, dname in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16")):
        rows = []
        model = EmbedNet2(class_num=395, arch=args.reid_arch, dtype=dtype)
        tx = make_optimizer(0.1, 100)
        probe = jnp.zeros((1, *hw, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), xRGB=probe, xIR=probe,
                               xZ=probe, modal=0, train=True)
        state = ReidState(step=jnp.zeros((), jnp.int32),
                          params=variables["params"],
                          batch_stats=variables["batch_stats"],
                          opt_state=tx.init(variables["params"]))
        n = max(args.iters // 6, 5)

        # --- backbone+part forward (train mode, all three modalities)
        def fwd(params, bstats, x):
            out, _ = model.apply(
                {"params": params, "batch_stats": bstats},
                xRGB=x, xIR=batch["ir"], xZ=batch["gray"], modal=0,
                train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(1)})
            return out
        profile_phase(f"fwd 3-modal {dname}", fwd,
                      (state.params, state.batch_stats, batch["rgb"]), n, rows)

        # --- the parsing criterion alone (same shapes the fwd produces)
        out = jax.eval_shape(fwd, state.params, state.batch_stats,
                             batch["rgb"])
        (parsing_s, fusion_s), (edge_s,) = out[2][0], out[2][1]
        mk = lambda s: jnp.asarray(rngd.normal(size=s.shape)
                                   .astype(np.float32))
        parsing, fusion, edge = mk(parsing_s), mk(fusion_s), mk(edge_s)
        labels3 = jnp.concatenate([batch["part1"], batch["part2"],
                                   batch["part1"]], axis=0)

        def crit(parsing_, fusion_, edge_, labels_, x_):
            labels_ = (labels_ + (x_[0, 0, 0, 0] * 0).astype(jnp.int32))
            edges = C.generate_edge(labels_).astype(jnp.int32)
            return C.criterion_all([parsing_, fusion_], [edge_],
                                   labels_, edges)
        profile_phase(f"parsing criterion {dname}", crit,
                      (parsing, fusion, edge, labels3, batch["rgb"]), n, rows)

        # --- Lovasz alone (the XLA sort inside the criterion)
        from vqvae2_tpu.part.lovasz import lovasz_softmax

        def lov(parsing_, labels_, x_):
            labels_ = (labels_ + (x_[0, 0, 0, 0] * 0).astype(jnp.int32))
            lh = jax.image.resize(
                parsing_, (parsing_.shape[0], labels_.shape[1],
                           labels_.shape[2], parsing_.shape[-1]), "bilinear")
            return lovasz_softmax(jax.nn.softmax(lh, -1), labels_,
                                  ignore=C.IGNORE)
        profile_phase(f"lovasz(sort) {dname}", lov,
                      (parsing, labels3, batch["rgb"]), n, rows)

        # --- full loss forward / backward / optimizer step
        step_fn = make_train_step(model, tx, num_pos, n_ids, hw).__wrapped__

        def full_step(state_, x_):
            b = dict(batch, rgb=x_)
            s, m = step_fn(state_, b, jax.random.PRNGKey(2))
            return (m["loss"], s.params, s.opt_state)
        profile_phase(f"train step {dname}", full_step, (state, batch["rgb"]),
                      n, rows)
        all_rows[dname] = rows

    print_table(all_rows)
    f32 = {r[0].rsplit(" ", 1)[0]: r[1] for r in all_rows["fp32"]}
    b16 = {r[0].rsplit(" ", 1)[0]: r[1] for r in all_rows["bf16"]}
    for k in f32:
        if k in b16:
            print(f"{k}: bf16 speedup {f32[k] / b16[k]:.2f}x "
                  f"({f32[k]:.1f} -> {b16[k]:.1f} ms)")


def profile_stargan(args):
    """Decompose the StarGAN-v2 bidirectional step (reference hot loop
    ``train_vqvae_deep_bi2.py:148-290``) at the evidence-run config
    (batch 4×4, resnet18, 288×144): reid fwd+bwd, generator fwd+bwd
    (2 generators ×2 passes for the cycle + reid-on-fakes + D-on-fakes),
    discriminator fwd+bwd with and without the nested-grad R1 penalty, and
    the full 3-optimizer step — VERDICT r4 weak #4 (831 ms/step unprofiled)."""
    import jax
    import jax.numpy as jnp
    import optax

    from vqvae2_tpu.models.stargan import ModelStarGAN
    from vqvae2_tpu.train.stargan_bi import (GanState, _generator_img_size,
                                             _split, make_loss_fns,
                                             make_train_step)

    n_ids, num_pos = args.gan_ids, 4
    hw = tuple(int(v) for v in args.gan_hw.split(","))
    bs = n_ids * num_pos
    print(f"backend: {jax.default_backend()}  stargan step P{n_ids}xK{num_pos}"
          f" ({bs} gray + {bs} ir rows, {hw[0]}x{hw[1]}, arch={args.gan_arch})",
          flush=True)
    rngd = np.random.default_rng(0)
    imgs = lambda: jnp.asarray(
        rngd.normal(size=(bs, *hw, 3)).astype(np.float32))
    batch = {"gray": imgs(), "ir": imgs(), "aug_rgb": imgs(),
             "aug_ir": imgs(),
             "label": jnp.asarray(np.repeat(np.arange(n_ids, dtype=np.int32),
                                            num_pos))}

    model = ModelStarGAN(class_num=16, arch=args.gan_arch,
                         img_size=_generator_img_size(*hw))
    tx_reid = optax.sgd(0.1, momentum=0.9, nesterov=True)
    tx_gen, tx_disc = optax.adam(1e-4), optax.adam(1e-4)
    probe = jnp.zeros((2 * num_pos, *hw, 3), jnp.float32)

    def init_probe(module):
        feat, *_ = module.person_id(xRGB=probe, xIR=probe, modal=0,
                                    with_feature=True)
        fv, fi = jnp.split(feat, 2, axis=0)
        g2i = module.gen_1(probe, fi)
        i2g = module.gen_2(probe, fv)
        y = jnp.zeros((probe.shape[0],), jnp.int32)
        return module.discriminate(probe, y)

    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           method=init_probe)
    reid_p, gen_p, disc_p = _split(variables["params"])
    bstats = variables.get("batch_stats", {})
    state = GanState(step=jnp.zeros((), jnp.int32),
                     params=variables["params"], batch_stats=bstats,
                     opt_reid=tx_reid.init(reid_p),
                     opt_gen=tx_gen.init(gen_p),
                     opt_disc=tx_disc.init(disc_p))
    reid_loss_fn, gen_loss_fn, disc_loss_fn = make_loss_fns(model, num_pos)
    cols = {"batch_stats": bstats}
    key = jax.random.PRNGKey(2)
    n = max(args.iters // 8, 5)
    rows = []

    def reid_phase(rp, other, x_):
        b = dict(batch, aug_rgb=x_)
        (l, (feat, _)), g = jax.value_and_grad(reid_loss_fn, has_aux=True)(
            rp, other, cols, b, key)
        return l, feat, g
    profile_phase("reid fwd+bwd", reid_phase,
                  (reid_p, {**gen_p, **disc_p}, batch["aug_rgb"]), n, rows)

    feat_s = jax.eval_shape(
        lambda rp: reid_loss_fn(rp, {**gen_p, **disc_p}, cols, batch,
                                key)[1][0], reid_p)
    featV = jnp.asarray(rngd.normal(size=(bs, feat_s.shape[-1]))
                        .astype(np.float32))
    featI = featV + 0.1

    def gen_phase(gp, other, x_):
        b = dict(batch, gray=x_)
        (l, (m, g2i, i2g)), g = jax.value_and_grad(gen_loss_fn, has_aux=True)(
            gp, other, cols, b, featV, featI, jnp.float32(0.5), key)
        return l, g2i, i2g, g
    profile_phase("gen fwd+bwd", gen_phase,
                  (gen_p, {**reid_p, **disc_p}, batch["gray"]), n, rows)

    g2i = jnp.asarray(rngd.normal(size=(bs, *hw, 3)).astype(np.float32))
    i2g = g2i[::-1]

    def disc_phase(with_r1):
        def fn(dp, other, x_):
            (l, aux), g = jax.value_and_grad(disc_loss_fn, has_aux=True)(
                dp, other, cols, x_, batch["ir"], g2i, i2g,
                jnp.float32(1.0), with_r1)
            return l, g
        return fn
    profile_phase("disc fwd+bwd (with R1)", disc_phase(True),
                  (disc_p, {**reid_p, **gen_p}, batch["gray"]), n, rows)
    profile_phase("disc fwd+bwd (no R1)", disc_phase(False),
                  (disc_p, {**reid_p, **gen_p}, batch["gray"]), n, rows)

    step_fn = make_train_step(model, tx_reid, tx_gen, tx_disc,
                              num_pos).__wrapped__

    def full_step(state_, x_):
        b = dict(batch, gray=x_)
        s, m = step_fn(state_, b, key)
        return (m["loss_gen"], s.params, s.opt_gen, s.opt_disc, s.opt_reid)
    profile_phase("train step (3 optimizers)", full_step,
                  (state, batch["gray"]), n, rows)

    print_table({"fp32": rows})
    byname = {r[0]: r[1] for r in rows}
    r1_ms = byname["disc fwd+bwd (with R1)"] - byname["disc fwd+bwd (no R1)"]
    print(f"R1 nested-grad cost: {r1_ms:.1f} ms "
          f"({100 * r1_ms / byname['train step (3 optimizers)']:.0f}% of step)")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--train_batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=60)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--reid", action="store_true",
                   help="profile the ReID+part step instead of stage-1")
    p.add_argument("--reid_ids", type=int, default=6)
    p.add_argument("--reid_arch", type=str, default="resnet50")
    p.add_argument("--stargan", action="store_true",
                   help="profile the StarGAN-v2 bidirectional step")
    p.add_argument("--gan_ids", type=int, default=4)
    p.add_argument("--gan_arch", type=str, default="resnet18")
    p.add_argument("--gan_hw", type=str, default="288,144",
                   help="input geometry (CPU smoke tests use 64,32)")
    args = p.parse_args()
    if args.reid:
        return profile_reid(args)
    if args.stargan:
        return profile_stargan(args)

    import jax
    import jax.numpy as jnp
    import optax

    from vqvae2_tpu.models.vqvae import VQVAE
    from vqvae2_tpu.train.vqvae import create_state, make_train_step

    print(f"backend: {jax.default_backend()}  batch={args.batch} "
          f"train_batch={args.train_batch} iters={args.iters}", flush=True)

    rngd = np.random.default_rng(0)
    x = jnp.asarray(rngd.normal(size=(args.batch, args.size, args.size, 3))
                    .astype(np.float32))
    xt = jnp.asarray(rngd.normal(size=(args.train_batch, args.size,
                                       args.size, 3)).astype(np.float32))

    all_rows = {}
    for dtype, dname in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16")):
        rows = []
        model = VQVAE(dtype=dtype)
        v = model.init(jax.random.PRNGKey(0), x[:1])

        # sub-phase forwards (inference path)
        enc_b = lambda v_, x_: model.apply(v_, x_,
                                           method=lambda m, y: m.enc_b(y))
        enc_t_in = model.apply(v, x, method=lambda m, y: m.enc_b(y))
        enc_t = lambda v_, y_: model.apply(v_, y_,
                                           method=lambda m, y: m.enc_t(y))
        encode_ids = lambda v_, x_: model.apply(v_, x_,
                                                method=model.encode_ids)
        full_fwd = lambda v_, x_: model.apply(v_, x_)[0]

        qt, qb, _, _, _ = model.apply(v, x, method=model.encode)
        decode = lambda v_, qt_: model.apply(v_, qt_, qb, method=model.decode)

        profile_phase(f"enc_b {dname}", enc_b, (v, x), args.iters, rows)
        profile_phase(f"enc_t {dname}", enc_t, (v, enc_t_in), args.iters, rows)
        profile_phase(f"encode_ids {dname} (headline)", encode_ids, (v, x),
                      args.iters, rows)
        profile_phase(f"decode {dname}", decode, (v, qt), args.iters, rows)
        profile_phase(f"full fwd {dname}", full_fwd, (v, x), args.iters, rows)

        # full train step (fwd+bwd+Adam+EMA) at train_batch
        tx = optax.adam(3e-4)
        state = create_state(model, tx, jax.random.PRNGKey(0),
                             (1, args.size, args.size, 3))
        raw_step = make_train_step(model, tx).__wrapped__

        def train_fn(state_, x_):
            s, m = raw_step(state_, x_)
            # return the WHOLE new state: timed_loop sums every output leaf,
            # so every param's Adam update, every opt-state moment, and the
            # EMA stats stay live — returning only one leaf lets XLA DCE the
            # optimizer update of every other parameter (measured: the
            # one-leaf program reports 65 GFLOP where the full step is ~190)
            return (m["loss"], s.params, s.opt_state, s.vq_stats)

        profile_phase(f"train step b{args.train_batch} {dname}", train_fn,
                      (state, xt), max(args.iters // 6, 5), rows)
        all_rows[dname] = rows

    print_table(all_rows)
    enc_f = [r for r in all_rows["fp32"] if r[0].startswith("encode_ids")][0]
    enc_b = [r for r in all_rows["bf16"] if r[0].startswith("encode_ids")][0]
    print(f"\nencode img/s: fp32 {args.batch / (enc_f[1] / 1e3):,.0f}  "
          f"bf16 {args.batch / (enc_b[1] / 1e3):,.0f}  "
          f"(bf16 speedup {enc_f[1] / enc_b[1]:.2f}x)")


if __name__ == "__main__":
    main()
