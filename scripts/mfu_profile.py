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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--train_batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=60)
    p.add_argument("--size", type=int, default=256)
    args = p.parse_args()

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

    print(f"\n| phase | ms/iter | GFLOP | TFLOP/s | %bf16-peak | GB/s | %HBM |")
    print("|---|---|---|---|---|---|---|")
    for dname, rows in all_rows.items():
        for (name, ms, gflop, tflops, pk, gbs, hbm) in rows:
            print(f"| {name} | {ms:.2f} | {gflop:.1f} | {tflops:.1f} | "
                  f"{pk:.0f}% | {gbs:.0f} | {hbm:.0f}% |")
    enc_f = [r for r in all_rows["fp32"] if r[0].startswith("encode_ids")][0]
    enc_b = [r for r in all_rows["bf16"] if r[0].startswith("encode_ids")][0]
    print(f"\nencode img/s: fp32 {args.batch / (enc_f[1] / 1e3):,.0f}  "
          f"bf16 {args.batch / (enc_b[1] / 1e3):,.0f}  "
          f"(bf16 speedup {enc_f[1] / enc_b[1]:.2f}x)")


if __name__ == "__main__":
    main()
