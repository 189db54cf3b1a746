"""One-command hardware verification: runs every TPU-specific correctness and
performance check on the real chip.  (The pytest suite deliberately runs on a
virtual CPU mesh; this script is its hardware counterpart — see
.claude/skills/verify/SKILL.md.)

Usage: python scripts/tpu_checks.py [--fast] [--heavy]

--heavy runs ONLY the ReID / adaptation / GAN / detection trainer
checks (big one-off remote compiles; the persistent compile cache
makes re-runs load from disk).  Each heavy check runs in its own
subprocess so the chip's HBM starts clean per trainer graph
(back-to-back in one process the runtime kept the previous trainer's
buffers live and the StarGAN check OOM'd); --no-isolate opts out.
tests/test_tpu_checks_heavy.py
executes the same check bodies at tiny configs on CPU (opt-in
`-m heavy_smoke`, 5-15 min each) so a typo never costs a
30-minute TPU compile.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def check(name):
    def deco(fn):
        fn._check_name = name
        return fn
    return deco


@check("pallas quantizer == XLA (indices exact, stats close)")
def check_quantize():
    import jax
    import jax.numpy as jnp

    from vqvae2_tpu.ops import quantize as qz

    rng = np.random.default_rng(0)
    flat = jnp.asarray(rng.normal(size=(32768, 64)).astype(np.float32))
    embed = jnp.asarray(rng.normal(size=(512, 64)).astype(np.float32))
    idx, q, cs, es = qz._nearest_code_pallas(flat, embed)
    ridx, rq, rcs, res_ = jax.jit(qz.nearest_code_reference)(flat, embed)
    assert (np.asarray(idx) == np.asarray(ridx)).all(), "index mismatch"
    assert np.allclose(np.asarray(cs), np.asarray(rcs)), "cluster sums"
    i2, q2 = qz._nearest_code_pallas_nostats(flat, embed)
    assert (np.asarray(i2) == np.asarray(ridx)).all(), "nostats index mismatch"
    # lookups must be the exact fp32 codebook rows (3-chunk split matmul;
    # the MXU fast-fp32 default would round them to bf16)
    gather = np.asarray(jnp.take(embed, idx, axis=0))
    assert (np.asarray(q) == gather).all(), "stats lookup not exact"
    assert (np.asarray(q2) == gather).all(), "nostats lookup not exact"
    return "32k rows, 512 codes: indices + lookups exact"


@check("flash attention == XLA full-matrix (fwd/bwd, dropout determinism)")
def check_flash_attention():
    import jax
    import jax.numpy as jnp

    from vqvae2_tpu.ops.flash_attention import (causal_attention_reference,
                                                causal_flash_attention)

    P = jax.lax.Precision.HIGHEST
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(2, 8, 1024, 16)).astype(np.float32))
               for _ in range(3))
    out_f = jax.jit(lambda q, k, v: causal_flash_attention(
        q, k, v, precision=P))(q, k, v)
    out_r = jax.jit(lambda q, k, v: causal_attention_reference(
        q, k, v, precision=P))(q, k, v)
    err = float(jnp.max(jnp.abs(out_f - out_r)))
    assert err < 1e-5, f"fwd err {err}"
    assert float(jnp.max(jnp.abs(out_f[:, :, 0]))) == 0.0, "row 0 not zero"

    def f_flash(q, k, v):
        return jnp.sum(jnp.sin(causal_flash_attention(q, k, v, precision=P)))

    def f_ref(q, k, v):
        return jnp.sum(jnp.sin(causal_attention_reference(q, k, v, precision=P)))

    gf = jax.jit(jax.grad(f_flash, argnums=(0, 1, 2)))(q, k, v)
    gr = jax.jit(jax.grad(f_ref, argnums=(0, 1, 2)))(q, k, v)
    gerr = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(gf, gr))
    assert gerr < 5e-3, f"grad err {gerr}"

    key = jax.random.PRNGKey(3)
    fd = jax.jit(lambda q, k, v: causal_flash_attention(
        q, k, v, dropout_rate=0.1, dropout_rng=key, precision=P))
    assert bool(jnp.array_equal(fd(q, k, v), fd(q, k, v))), "dropout not deterministic"
    return f"n=1024: fwd err {err:.1e}, grad err {gerr:.1e}, dropout deterministic"


@check("fused inplace-ABN fwd+bwd vs autodiff")
def check_abn():
    import jax
    import jax.numpy as jnp

    from vqvae2_tpu.ops.inplace_abn import batch_moments, inplace_abn

    rng = np.random.default_rng(0)
    c = 256
    x = jnp.asarray(rng.normal(size=(16, 48, 16, c)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(c,)) + 0.5, jnp.float32)
    b = jnp.asarray(rng.normal(size=(c,)), jnp.float32)

    def fused(x, w, b):
        mean, var = batch_moments(x)
        z = inplace_abn(x, w, b, jax.lax.stop_gradient(mean),
                        jax.lax.stop_gradient(var))
        return jnp.sum(jnp.sin(z))

    def unfused(x, w, b):
        mean, var = batch_moments(x)
        w_t = jnp.abs(w) + 1e-5
        y = (x - mean) * jax.lax.rsqrt(var + 1e-5) * w_t + b
        return jnp.sum(jnp.sin(jnp.where(y >= 0, y, 0.01 * y)))

    gf = jax.jit(jax.grad(fused, argnums=(0, 1, 2)))(x, w, b)
    gu = jax.jit(jax.grad(unfused, argnums=(0, 1, 2)))(x, w, b)
    errs = [float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9))
            for a, b in zip(gf, gu)]
    assert max(errs) < 1e-4, f"grad errs {errs}"
    return f"max grad rel err {max(errs):.2e}"


@check("incremental sampler == full-forward sampler (same draws)")
def check_incremental(fast: bool = False):
    import jax
    import jax.numpy as jnp

    from vqvae2_tpu.models.incremental import sample_prior_incremental
    from vqvae2_tpu.models.pixelsnail import PixelSNAIL
    from vqvae2_tpu.models.sampling import sample_prior

    model = PixelSNAIL(shape=(8, 8), n_class=32, channel=32, kernel_size=5,
                       n_block=2, n_res_block=2, res_channel=32, dropout=0.0)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8), jnp.int32))
    a = sample_prior(model, v, jax.random.PRNGKey(7), 2, (8, 8))
    b = sample_prior_incremental(model, v, jax.random.PRNGKey(7), 2)
    assert (np.asarray(a) == np.asarray(b)).all(), "draw mismatch"
    return "8x8 grid: bit-identical draws"


@check("encode+quantize throughput (bench headline)")
def check_bench():
    import jax
    import jax.numpy as jnp

    from vqvae2_tpu.models.vqvae import VQVAE

    model = VQVAE()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 256, 256, 3)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x[:1])

    def make_encode_n(n_iter):
        # Data-dependent input perturbation defeats while-loop LICM (without
        # it the whole encode hoists out and the loop times ONE iteration).
        @jax.jit
        def encode_n(v, x):
            def body(i, carry):
                acc, eps = carry
                id_t, id_b = model.apply(v, x + eps,
                                         method=model.encode_ids)
                s = id_t.sum() + id_b.sum()
                return acc + s, (s % 3).astype(jnp.float32) * 1e-12

            acc, _ = jax.lax.fori_loop(
                0, n_iter, body,
                (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.float32)))
            return acc

        return encode_n

    def timed(fn):
        int(fn(v, x))  # compile + warm
        best = np.inf  # best-of-3: 1st post-compile exec pays a one-off
        for _ in range(3):  # program/argument-upload cost through the tunnel
            t0 = time.perf_counter()
            int(fn(v, x))
            best = min(best, time.perf_counter() - t0)
        return best

    # 60/120 iterations: long enough that the fixed ~36 ms tunneled
    # dispatch+fetch cost stays <5% and the 2x ratio is clean
    dt60, dt120 = timed(make_encode_n(60)), timed(make_encode_n(120))
    ratio = dt120 / dt60
    assert 1.7 < ratio < 2.3, (
        f"timing loop not scaling with n_iter (ratio {ratio:.2f}) — "
        f"LICM is hoisting the encode again")
    ips = 64 * 120 / dt120
    assert ips > 1000, f"throughput collapsed: {ips}"
    return f"{ips:,.0f} img/s/chip (2x-iter ratio {ratio:.2f})"


@check("256px full train-step throughput (fwd+bwd+Adam+EMA)")
def check_train_step(fast: bool = False):
    if fast:
        return "skipped (--fast)"
    import jax
    import jax.numpy as jnp
    import optax

    from vqvae2_tpu.models.vqvae import VQVAE
    from vqvae2_tpu.train.vqvae import create_state, make_train_step

    batch, n_steps = 8, 10
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 256, 256, 3)).astype(np.float32))
    results = []
    for dtype, name in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16")):
        model = VQVAE(dtype=dtype)
        tx = optax.adam(3e-4)
        state = create_state(model, tx, jax.random.PRNGKey(0),
                             (1, 256, 256, 3))
        # Scan over the RAW step body (`.__wrapped__` strips the jit): nesting
        # the donated jit inside a scan forces an un-inlined child call whose
        # buffers cannot alias the scan carry — measured 10x slower than the
        # same math inlined (85 vs 7.7 ms/iter at fp32 b8). Real training
        # calls the donated jit per-batch at top level, where donation works.
        step = make_train_step(model, tx).__wrapped__

        # scan threads state through the body — a true sequential dependence
        # (params/opt/EMA change every iteration), so LICM cannot hoist it
        @jax.jit
        def run(state, x):
            def body(s, _):
                s, metrics = step(s, x)
                return s, metrics["loss"]
            return jax.lax.scan(body, state, None, length=n_steps)

        # scalar fetch forces completion — block_until_ready alone is
        # unreliable through the tunnel (see CLAUDE.md).  Time best-of-3:
        # the first post-compile execution carries a one-off ~70 ms
        # program/argument-upload cost through the tunnel (measured: 2nd
        # execution 84 ms/iter, 3rd+ 7.7 ms/iter at fp32 b8).
        st, losses = run(state, x)    # compile + warm
        first = float(losses[0])
        best, last = np.inf, np.nan
        for _ in range(3):
            t0 = time.perf_counter()
            st, losses = run(st, x)
            last = float(losses[-1])
            best = min(best, time.perf_counter() - t0)
        assert np.isfinite(last), f"{name} loss {last}"
        # learning evidence, not just finiteness: 40 optimizer steps from
        # init must reduce the loss (reference converges, README.md:38-44)
        assert last < first, f"{name} loss rose: {first:.4f} -> {last:.4f}"
        results.append(f"{name} {batch * n_steps / best:,.0f} img/s "
                       f"(loss {first:.3f}->{last:.3f})")
    return f"b{batch}: " + ", ".join(results)


@check("b32-equivalent train step via in-jit grad accumulation")
def check_grad_accum(fast: bool = False):
    if fast:
        return "skipped (--fast)"
    import jax
    import jax.numpy as jnp
    import optax

    from vqvae2_tpu.models.vqvae import VQVAE
    from vqvae2_tpu.train.vqvae import create_state, make_train_step

    accum, micro, n_steps = 4, 8, 5
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(accum, micro, 256, 256, 3))
                    .astype(np.float32))
    model = VQVAE()
    tx = optax.adam(3e-4)
    state = create_state(model, tx, jax.random.PRNGKey(0), (1, 256, 256, 3))
    step = make_train_step(model, tx, grad_accum=accum).__wrapped__

    @jax.jit
    def run(state, x):
        def body(s, _):
            s, metrics = step(s, x)
            return s, metrics["loss"]
        return jax.lax.scan(body, state, None, length=n_steps)

    st, losses = run(state, x)
    first = float(losses[0])
    best, last = np.inf, np.nan
    for _ in range(3):
        t0 = time.perf_counter()
        st, losses = run(st, x)
        last = float(losses[-1])  # block INSIDE the timed region
        best = min(best, time.perf_counter() - t0)
    assert np.isfinite(last) and last < first, f"loss {first}->{last}"
    ips = accum * micro * n_steps / best
    return (f"global b{accum * micro} = {accum}x b{micro} microbatches: "
            f"{ips:,.0f} img/s (loss {first:.3f}->{last:.3f})")


@check("stage-2 train-step timing (full reference configs, bf16+rbg)")
def check_stage2_step(fast: bool = False):
    if fast:
        return "skipped (--fast)"
    import argparse

    import jax
    import jax.numpy as jnp
    import optax

    from vqvae2_tpu.train.pixelsnail import (PriorState, build_model,
                                             make_train_step)

    results = []
    for hier, batch in (("top", 32), ("bottom", 16)):
        args = argparse.Namespace(
            n_class=512, channel=256, n_res_block=4, n_res_channel=256,
            n_out_res_block=0, n_cond_res_block=3, dropout=0.1, bf16=True)
        model = build_model(hier, args)
        conditional = hier == "bottom"
        hw = 64 if conditional else 32
        rng = np.random.default_rng(0)
        batch_d = {"target": jnp.asarray(rng.integers(
            0, 512, size=(batch, hw, hw)).astype(np.int32))}
        init_cond = None
        if conditional:
            batch_d["condition"] = jnp.asarray(rng.integers(
                0, 512, size=(batch, 32, 32)).astype(np.int32))
            init_cond = jnp.zeros((1, 32, 32), jnp.int32)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, hw, hw), jnp.int32),
                               condition=init_cond)
        tx = optax.adam(3e-4)
        state = PriorState(step=jnp.zeros((), jnp.int32),
                           params=variables["params"],
                           opt_state=tx.init(variables["params"]))
        step = make_train_step(model, tx, conditional).__wrapped__
        key = jax.random.key(1, impl="unsafe_rbg")
        n_steps = 5

        @jax.jit
        def run(state, batch):
            def body(s, _):
                s, m = step(s, batch, key)
                return s, m["loss"]
            return jax.lax.scan(body, state, None, length=n_steps)

        st, losses = run(state, batch_d)
        first = float(losses[0])
        best, last = np.inf, np.nan
        for _ in range(3):
            t0 = time.perf_counter()
            st, losses = run(st, batch_d)
            last = float(losses[-1])  # block INSIDE the timed region
            best = min(best, time.perf_counter() - t0)
        assert np.isfinite(last) and last < first, f"{hier} loss {first}->{last}"
        ms = best / n_steps * 1e3
        results.append(f"{hier} b{batch}: {ms:.1f} ms/step "
                       f"({batch / (best / n_steps):,.0f} rows/s)")
    return "; ".join(results)


@check("full-size incremental sampling rate")
def check_sampling_rate(fast: bool = False):
    if fast:
        return "skipped (--fast)"
    import jax
    import jax.numpy as jnp

    from vqvae2_tpu.models.incremental import sample_prior_incremental
    from vqvae2_tpu.models.pixelsnail import PixelSNAIL

    model = PixelSNAIL(shape=(32, 32), n_class=512, channel=256, kernel_size=5,
                       n_block=4, n_res_block=4, res_channel=256, dropout=0.1)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32), jnp.int32))
    np.asarray(sample_prior_incremental(model, v, jax.random.PRNGKey(1), 8))
    t0 = time.perf_counter()
    np.asarray(sample_prior_incremental(model, v, jax.random.PRNGKey(2), 8))
    rate = 1024 / (time.perf_counter() - t0)
    assert rate > 200, f"sampling rate collapsed: {rate}"
    return f"{rate:,.0f} steps/s (batch 8, [32,32]x512)"


@check("bottom-conditional sampling rate (N=4096 + condition)")
def check_bottom_sampling_rate(fast: bool = False):
    """The expensive half of generation the reference runs at sample.py:92-95:
    the [64,64] conditional attention-free prior, 4096 sequential steps."""
    if fast:
        return "skipped (--fast)"
    import jax
    import jax.numpy as jnp

    from vqvae2_tpu.models.incremental import sample_prior_incremental
    from vqvae2_tpu.models.pixelsnail import PixelSNAIL

    model = PixelSNAIL(shape=(64, 64), n_class=512, channel=256, kernel_size=5,
                       n_block=4, n_res_block=4, res_channel=256,
                       attention=False, dropout=0.1,
                       n_cond_res_block=3, cond_res_channel=256)
    cond = jnp.asarray(np.random.default_rng(0).integers(
        0, 512, size=(8, 32, 32)).astype(np.int32))
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64), jnp.int32),
                   condition=cond[:1])
    np.asarray(sample_prior_incremental(model, v, jax.random.PRNGKey(1), 8,
                                        condition=cond))
    t0 = time.perf_counter()
    np.asarray(sample_prior_incremental(model, v, jax.random.PRNGKey(2), 8,
                                        condition=cond))
    rate = 4096 / (time.perf_counter() - t0)
    assert rate > 50, f"bottom sampling rate collapsed: {rate}"
    return f"{rate:,.0f} steps/s (batch 8, [64,64]x512 conditional)"


@check("end-to-end generation wall time (top -> bottom -> decode -> PNG)")
def check_e2e_generation(fast: bool = False):
    """The full vq2-sample path at the reference config (sample.py:75-100),
    batch 16, random-init weights (wall time is weight-independent)."""
    if fast:
        return "skipped (--fast)"
    import tempfile

    import jax
    import jax.numpy as jnp

    from vqvae2_tpu.models.incremental import sample_prior_incremental
    from vqvae2_tpu.models.pixelsnail import PixelSNAIL
    from vqvae2_tpu.models.vqvae import VQVAE
    from vqvae2_tpu.utils.image import save_image

    batch = 16
    top_model = PixelSNAIL(shape=(32, 32), n_class=512, channel=256,
                           kernel_size=5, n_block=4, n_res_block=4,
                           res_channel=256, dropout=0.1)
    bot_model = PixelSNAIL(shape=(64, 64), n_class=512, channel=256,
                           kernel_size=5, n_block=4, n_res_block=4,
                           res_channel=256, attention=False, dropout=0.1,
                           n_cond_res_block=3, cond_res_channel=256)
    vqvae = VQVAE()
    tv = top_model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32), jnp.int32))
    bv = bot_model.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, 64, 64), jnp.int32),
                        condition=jnp.zeros((1, 32, 32), jnp.int32))
    vv = vqvae.init(jax.random.PRNGKey(2), jnp.zeros((1, 256, 256, 3),
                                                     jnp.float32))

    def generate(seed):
        r_top, r_bot = jax.random.split(jax.random.PRNGKey(seed))
        top = sample_prior_incremental(top_model, tv, r_top, batch)
        bottom = sample_prior_incremental(bot_model, bv, r_bot, batch,
                                          condition=top)
        decoded = vqvae.apply(vv, top, bottom, method=vqvae.decode_code)
        return np.clip(np.asarray(decoded), -1, 1)

    imgs = generate(0)  # compile + warm
    t0 = time.perf_counter()
    imgs = generate(1)
    with tempfile.NamedTemporaryFile(suffix=".png") as f:
        save_image(imgs, f.name, nrow=4)
        dt = time.perf_counter() - t0
    per_min = batch / dt * 60
    assert per_min > 10, f"e2e generation collapsed: {per_min:.1f} img/min"
    return f"batch {batch} in {dt:.1f}s = {per_min:,.0f} img/min (256px)"


# --------------------------------------------------------------------------
# Heavy group (--heavy): the ReID / adaptation / GAN / detection trainer
# families on hardware.  Each first compile is a big graph through the
# tunnel (5-40 min, one-off — the persistent compile cache in
# utils/compile_cache.py makes re-runs load from disk), so these run only
# when asked for.  Every train-step check asserts its loss FALLS, mirroring
# check_train_step.
# --------------------------------------------------------------------------


def _time_train_scan(step_raw, state, args_tuple, n_steps, pick=None):
    """Scan the raw (unjitted) step body n_steps times inside one jit and
    time best-of-3 executions (same methodology as check_train_step: the
    state carry is a true sequential dependence, so LICM cannot hoist the
    step; the first post-compile run pays a one-off upload cost)."""
    import jax

    pick = pick or (lambda m: m["loss"] if isinstance(m, dict) else m)

    @jax.jit
    def run(state, *args):
        def body(s, _):
            s, out = step_raw(s, *args)
            return s, pick(out)
        return jax.lax.scan(body, state, None, length=n_steps)

    st, losses = run(state, *args_tuple)
    first = float(losses[0])
    best, last = np.inf, np.nan
    for _ in range(3):
        t0 = time.perf_counter()
        st, losses = run(st, *args_tuple)
        last = float(losses[-1])  # scalar fetch blocks INSIDE the timed region
        best = min(best, time.perf_counter() - t0)
    return best / n_steps, first, last


def _sysu_like_batch(rng, n_ids, num_pos, hw, parts=False):
    """Identity-structured random batch in the SYSU tensor layout."""
    import jax.numpy as jnp
    n = n_ids * num_pos
    mk = lambda: jnp.asarray(rng.normal(size=(n, *hw, 3)).astype(np.float32))
    batch = {"rgb": mk(), "ir": mk(),
             "label": jnp.asarray(np.repeat(np.arange(n_ids), num_pos)
                                  .astype(np.int32))}
    if parts:
        batch["gray"] = mk()
        for k in ("part1", "part2"):
            batch[k] = jnp.asarray(rng.integers(
                0, 7, size=(n, *hw)).astype(np.int32))
    return batch


@check("ReID train step (EmbedNet2+parsing, resnet50, 288x144, P6xK4)")
def check_reid_step(heavy: bool = False, n_ids=6, num_pos=4,
                    hw=(288, 144), arch="resnet50", class_num=395,
                    n_steps=4, bf16=False):
    """The reference's train_reid.py hot loop (3-modality forward + parsing
    + part-InfoNCE + cross-modal triplets) at the trainer-default config."""
    if not heavy:
        return "skipped (needs --heavy)"
    import jax
    import jax.numpy as jnp

    from vqvae2_tpu.part.part_model import EmbedNet2
    from vqvae2_tpu.train.reid import ReidState, make_optimizer, make_train_step

    rng = np.random.default_rng(0)
    batch = _sysu_like_batch(rng, n_ids, num_pos, hw, parts=True)
    model = EmbedNet2(class_num=class_num, arch=arch,
                      dtype=jnp.bfloat16 if bf16 else jnp.float32)
    tx = make_optimizer(0.1, steps_per_epoch=1000)
    probe = jnp.zeros((1, *hw, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), xRGB=probe, xIR=probe,
                           xZ=probe, modal=0, train=True)
    state = ReidState(step=jnp.zeros((), jnp.int32),
                      params=variables["params"],
                      batch_stats=variables["batch_stats"],
                      opt_state=tx.init(variables["params"]))
    step = make_train_step(model, tx, num_pos, n_ids, hw).__wrapped__
    key = jax.random.key(1, impl="unsafe_rbg")
    sec, first, last = _time_train_scan(step, state, (batch, key), n_steps)
    assert np.isfinite(last) and last < first, f"loss {first}->{last}"
    n = n_ids * num_pos
    return (f"{sec * 1e3:.0f} ms/step ({3 * n / sec:,.0f} img/s incl. 3 "
            f"modalities; loss {first:.2f}->{last:.2f})")


@check("ReID train step bf16 (--bf16 path of train/reid.py)")
def check_reid_step_bf16(heavy: bool = False):
    return check_reid_step(heavy=heavy, bf16=True)


@check("deep-adaptive train step (ModelAdaptive_Deep, 288x144, P4xK4)")
def check_adaptive_deep_step(heavy: bool = False, n_ids=4, num_pos=4,
                             hw=(288, 144), arch="resnet18", class_num=395,
                             n_steps=4):
    """The reference's train_vqvae_deep.py two-optimizer hot loop (reid step
    + masked-recon generator step) at the trainer-default config."""
    if not heavy:
        return "skipped (needs --heavy)"
    import jax
    import jax.numpy as jnp
    import optax

    from vqvae2_tpu.models.adaptive import ModelAdaptive_Deep
    from vqvae2_tpu.train.vqvae_deep import (DeepState, _split_params,
                                             make_train_step)

    # hw: H/8, W/8 must be even (deep geometry)
    rng = np.random.default_rng(0)
    batch = _sysu_like_batch(rng, n_ids, num_pos, hw)
    model = ModelAdaptive_Deep(class_num=class_num, arch=arch)
    tx_reid, tx_gen = optax.adam(3e-4), optax.adam(3e-4)
    probe = jnp.zeros((2, *hw, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        probe, method=model.init_probe)
    reid_params, gen_params = _split_params(variables["params"])
    state = DeepState(step=jnp.zeros((), jnp.int32),
                      params=variables["params"],
                      batch_stats=variables.get("batch_stats", {}),
                      vq_stats=variables.get("vq_stats", {}),
                      opt_reid=tx_reid.init(reid_params),
                      opt_gen=tx_gen.init(gen_params))
    step = make_train_step(model, tx_reid, tx_gen, num_pos).__wrapped__
    key = jax.random.key(2, impl="unsafe_rbg")
    sec, first, last = _time_train_scan(step, state, (batch, key), n_steps,
                                        pick=lambda m: m["loss_gen"])
    assert np.isfinite(last) and last < first, f"loss_gen {first}->{last}"
    return (f"{sec * 1e3:.0f} ms/step ({n_ids * num_pos / sec:,.0f} img/s; "
            f"loss_gen {first:.2f}->{last:.2f})")


@check("StarGAN-v2 train step (3 optimizers + R1, 288x144, P4xK4)")
def check_stargan_step(heavy: bool = False, n_ids=4, num_pos=4,
                       hw=(288, 144), arch="resnet18", class_num=395,
                       img_size=None, n_steps=4):
    """The reference's train_vqvae_deep_bi2.py hot loop: reid + two
    generators + image discriminator with R1 (nested grad)."""
    if not heavy:
        return "skipped (needs --heavy)"
    import jax
    import jax.numpy as jnp
    import optax

    from vqvae2_tpu.models.stargan import ModelStarGAN
    from vqvae2_tpu.train.stargan_bi import (GanState, _generator_img_size,
                                             _split, make_train_step)

    if img_size is None:
        # mirror the trainer: the hourglass must divide the image geometry
        # exactly (128 at SYSU 288x144, the reference's Generator(256//2))
        img_size = _generator_img_size(*hw)
    rng = np.random.default_rng(0)
    b = _sysu_like_batch(rng, n_ids, num_pos, hw)
    gray = jnp.repeat(jnp.mean(b["rgb"], axis=-1, keepdims=True), 3, axis=-1)
    batch = {"gray": gray, "ir": b["ir"], "aug_rgb": b["rgb"],
             "aug_ir": b["ir"], "label": b["label"]}
    model = ModelStarGAN(class_num=class_num, arch=arch, img_size=img_size)
    tx_reid = optax.sgd(0.1, momentum=0.9, nesterov=True)
    tx_gen, tx_disc = optax.adam(1e-4), optax.adam(1e-4)
    probe = jnp.zeros((2 * num_pos, *hw, 3), jnp.float32)

    def init_probe(module):
        feat, *_ = module.person_id(xRGB=probe, xIR=probe, modal=0,
                                    with_feature=True)
        fv, fi = jnp.split(feat, 2, axis=0)
        module.gen_1(probe, fi)
        module.gen_2(probe, fv)
        return module.discriminate(probe,
                                   jnp.zeros((probe.shape[0],), jnp.int32))

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        method=init_probe)
    reid_params, gen_params, disc_params = _split(variables["params"])
    state = GanState(step=jnp.zeros((), jnp.int32),
                     params=variables["params"],
                     batch_stats=variables.get("batch_stats", {}),
                     opt_reid=tx_reid.init(reid_params),
                     opt_gen=tx_gen.init(gen_params),
                     opt_disc=tx_disc.init(disc_params))
    step = make_train_step(model, tx_reid, tx_gen, tx_disc, num_pos).__wrapped__
    key = jax.random.key(3, impl="unsafe_rbg")
    sec, first, last = _time_train_scan(
        step, state, (batch, key), n_steps,
        pick=lambda m: m["d_real"] + m["d_fake"])
    assert np.isfinite(last) and last < first, f"D loss {first}->{last}"
    return (f"{sec * 1e3:.0f} ms/step ({n_ids * num_pos / sec:,.0f} img/s; "
            f"D {first:.2f}->{last:.2f})")


@check("SSD300 train step (MultiBox, 300px, b8)")
def check_ssd_step(heavy: bool = False, batch=8, n_steps=10):
    if not heavy:
        return "skipped (needs --heavy)"
    import tempfile

    import jax
    import jax.numpy as jnp
    import optax

    from vqvae2_tpu.detection import boxes as B
    from vqvae2_tpu.detection.data import (CocoDetectionDataset,
                                           make_synthetic_coco)
    from vqvae2_tpu.detection.ssd import SSD300
    from vqvae2_tpu.train.detection import DetState, make_train_step

    with tempfile.TemporaryDirectory() as td:
        img_dir, ann = make_synthetic_coco(td, n=batch, size=300,
                                           n_classes=13)
        dataset = CocoDetectionDataset(img_dir, ann, size=300)
        imgs, gt_boxes, gt_labels, _ = next(iter(
            dataset.batches(batch, shuffle=False)))
    imgs, gt_boxes, gt_labels = map(jnp.asarray, (imgs, gt_boxes, gt_labels))
    model = SSD300(num_classes=dataset.num_classes, arch="resnet18")
    tx = optax.adam(1e-3)
    dboxes = B.default_boxes_ssd300(fig_size=300)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 300, 300, 3)))
    state = DetState(step=jnp.zeros((), jnp.int32),
                     params=variables["params"],
                     batch_stats=variables["batch_stats"],
                     opt_state=tx.init(variables["params"]))
    step = make_train_step(model, tx, dboxes).__wrapped__
    sec, first, last = _time_train_scan(
        step, state, (imgs, gt_boxes, gt_labels), n_steps)
    assert np.isfinite(last) and last < first, f"loss {first}->{last}"
    return (f"{sec * 1e3:.1f} ms/step ({batch / sec:,.0f} img/s; "
            f"loss {first:.2f}->{last:.2f})")


@check("Mask R-CNN train step (RPN+RoI+mask, 256px, b4)")
def check_maskrcnn_step(heavy: bool = False, batch=4, size=256,
                        num_proposals=64, n_steps=10):
    if not heavy:
        return "skipped (needs --heavy)"
    import tempfile

    import jax
    import jax.numpy as jnp
    import optax

    from vqvae2_tpu.detection import mask_rcnn as M
    from vqvae2_tpu.detection.data import (CocoDetectionDataset,
                                           make_synthetic_coco)
    from vqvae2_tpu.train.maskrcnn import MRState, make_train_step

    with tempfile.TemporaryDirectory() as td:
        img_dir, ann = make_synthetic_coco(td, n=batch, size=size,
                                           n_classes=13, with_masks=True)
        dataset = CocoDetectionDataset(img_dir, ann, size=size,
                                       with_masks=True)
        imgs, gt_boxes, gt_labels, _, gt_masks = next(iter(
            dataset.batches(batch, shuffle=False, with_masks=True)))
    imgs, gt_boxes, gt_labels, gt_masks = map(
        jnp.asarray, (imgs, gt_boxes, gt_labels, gt_masks))
    model = M.MaskRCNN(num_classes=dataset.num_classes, img_size=size,
                       num_proposals=num_proposals, arch="resnet18")
    anchors = M.generate_anchors(size)
    tx = optax.adam(1e-4)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, size, size, 3)))
    p2 = jnp.zeros((1, size // 4, size // 4, 128))
    rois = jnp.zeros((1, num_proposals, 4))
    roi_vars = model.init(jax.random.PRNGKey(1), p2, rois,
                          method=model.roi_outputs)
    params = {**roi_vars["params"], **variables["params"]}
    state = MRState(step=jnp.zeros((), jnp.int32), params=params,
                    batch_stats=variables.get("batch_stats", {}),
                    opt_state=tx.init(params))
    step = make_train_step(model, tx, anchors).__wrapped__
    sec, first, last = _time_train_scan(
        step, state, (imgs, gt_boxes, gt_labels, gt_masks), n_steps,
        pick=lambda m: m["rpn_cls"])  # monotone term; total spikes on
    # proposal turnover (see tests/test_convergence2.py::test_maskrcnn_loss_falls)
    assert np.isfinite(last) and last < first, f"rpn_cls {first}->{last}"
    return (f"{sec * 1e3:.1f} ms/step ({batch / sec:,.0f} img/s; "
            f"rpn_cls {first:.2f}->{last:.2f})")


@check("ReID feature-extraction throughput (eval fwd, 288x144)")
def check_reid_extract(heavy: bool = False, batch=128, hw=(288, 144),
                       arch="resnet50", class_num=395, n_iter=20,
                       min_ips=100.0):
    """The retrieval serving path (reference ext_feat, reid_tools.py:43-64):
    eval-mode EmbedNet2 forward to L2-normed features, LICM-proofed loop."""
    if not heavy:
        return "skipped (needs --heavy)"
    import jax
    import jax.numpy as jnp

    from vqvae2_tpu.part.part_model import EmbedNet2

    model = EmbedNet2(class_num=class_num, arch=arch)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, *hw, 3)).astype(np.float32))
    probe = jnp.zeros((1, *hw, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), xRGB=probe, xIR=probe,
                           xZ=probe, modal=0, train=True)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}

    @jax.jit
    def extract_n(v, x):
        def body(i, carry):
            acc, eps = carry
            feat = model.apply(v, xRGB=x + eps, modal=1)[1]
            s = feat.sum()
            return acc + s, s * 1e-12  # data dependence defeats LICM
        acc, _ = jax.lax.fori_loop(
            0, n_iter, body,
            (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)))
        return acc

    float(extract_n(variables, x))  # compile + warm
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(extract_n(variables, x))
        best = min(best, time.perf_counter() - t0)
    ips = batch * n_iter / best
    assert ips > min_ips, f"extraction collapsed: {ips}"
    return f"{ips:,.0f} img/s (batch {batch}, L2-normed features)"


HEAVY_CHECKS = [check_reid_step, check_reid_step_bf16,
                check_adaptive_deep_step, check_stargan_step,
                check_ssd_step, check_maskrcnn_step, check_reid_extract]


def _run_check(fn, args):
    """Run one check in-process and print its PASS/FAIL line. Returns 0/1."""
    name = fn._check_name
    try:
        varnames = fn.__code__.co_varnames[:fn.__code__.co_argcount]
        kwargs = {}
        if "fast" in varnames:
            kwargs["fast"] = args.fast
        if "heavy" in varnames:
            kwargs["heavy"] = args.heavy
        t0 = time.perf_counter()
        msg = fn(**kwargs)
        print(f"PASS  {name}: {msg} ({time.perf_counter()-t0:.1f}s)",
              flush=True)
        return 0
    except Exception as e:
        print(f"FAIL  {name}: {e!r}", flush=True)
        return 1


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--fast", action="store_true",
                   help="skip the slow full-size sampling check")
    p.add_argument("--heavy", action="store_true",
                   help="run ONLY the heavy ReID/GAN/detection trainer checks"
                        " (big one-off remote compiles; cached re-runs are fast)")
    p.add_argument("--only", default="",
                   help="comma-separated case-insensitive substrings; run only"
                        " checks whose name matches one (e.g. --only stargan)")
    p.add_argument("--no-isolate", action="store_true",
                   help="run heavy checks in-process instead of one subprocess"
                        " each (isolation frees HBM between trainer graphs;"
                        " without it back-to-back checks can OOM the chip)")
    p.add_argument("--run-one", default="", help=argparse.SUPPRESS)
    args = p.parse_args()

    fast_checks = [check_quantize, check_flash_attention, check_abn,
                   check_incremental, check_bench, check_train_step,
                   check_grad_accum, check_stage2_step, check_sampling_rate,
                   check_bottom_sampling_rate, check_e2e_generation]

    if args.run_one:  # child process: dispatch by function name, no banner
        by_name = {f.__name__: f for f in fast_checks + HEAVY_CHECKS}
        sys.exit(_run_check(by_name[args.run_one], args))

    import jax

    print(f"backend: {jax.default_backend()} {jax.devices()}", flush=True)
    checks = HEAVY_CHECKS if args.heavy else fast_checks
    if args.only:
        pats = [s.strip().lower() for s in args.only.split(",") if s.strip()]
        checks = [fn for fn in checks
                  if any(pat in fn._check_name.lower() for pat in pats)]
        print(f"--only {args.only!r}: {len(checks)} checks", flush=True)

    # Heavy trainer graphs each hold multi-GB HBM working sets; the runtime
    # does not reliably return that memory between jit programs in one
    # process (observed: StarGAN RESOURCE_EXHAUSTED when run right after the
    # deep-adaptive check).  Run each heavy check in its own subprocess so
    # the chip starts clean; the persistent compile cache keeps re-runs fast.
    isolate = args.heavy and not args.no_isolate and len(checks) > 1
    failed = 0
    for fn in checks:
        if isolate:
            import subprocess
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--run-one", fn.__name__]
            if args.fast:
                cmd.append("--fast")
            if args.heavy:
                cmd.append("--heavy")
            rc = subprocess.run(cmd).returncode
            if rc != 0:
                failed += 1
                if rc != 1:  # hard crash: the child printed no FAIL line
                    print(f"FAIL  {fn._check_name}: subprocess exited {rc}",
                          flush=True)
        else:
            failed += _run_check(fn, args)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
