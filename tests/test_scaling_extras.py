"""FSDP sharding helper + codebook-health extras."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae2_tpu import parallel as par
from vqvae2_tpu.models.vqvae import Quantize, VQVAE


@pytest.mark.slow
def test_fsdp_shard_consistency(devices, rng):
    """An FSDP-sharded state must produce the same train step results as a
    replicated one (GSPMD inserts the gathers)."""
    import optax

    from vqvae2_tpu.train.vqvae import create_state, make_train_step

    mesh = par.make_mesh(devices)
    model = VQVAE(channel=16, n_res_block=1, n_res_channel=8, embed_dim=8,
                  n_embed=16)
    tx = optax.adam(1e-3)
    state = create_state(model, tx, jax.random.PRNGKey(0), (1, 32, 32, 3))
    step = make_train_step(model, tx)
    x = jnp.asarray(rng.normal(size=(8, 32, 32, 3)), jnp.float32)

    s_rep = par.replicate(state, mesh)
    out_rep, m_rep = step(s_rep, par.shard_batch(np.asarray(x), mesh))

    # the step donates its state — rebuild (same rng => identical values)
    state = create_state(model, tx, jax.random.PRNGKey(0), (1, 32, 32, 3))
    s_fsdp = state.replace(params=par.fsdp_shard(state.params, mesh,
                                                 min_size=128))
    out_fsdp, m_fsdp = step(s_fsdp, par.shard_batch(np.asarray(x), mesh))

    np.testing.assert_allclose(float(m_rep["loss"]), float(m_fsdp["loss"]),
                               rtol=1e-5)
    # sharded leaves really are sharded
    sharded = [x for x in jax.tree_util.tree_leaves(s_fsdp.params)
               if x.size >= 128 and any(s % 8 == 0 for s in x.shape)]
    assert any(not s.sharding.is_fully_replicated for s in sharded)


@pytest.mark.slow
def test_grad_accum_matches_sequential_reference(rng):
    """grad_accum=K (in-jit scan of K microbatches, summed/averaged grads,
    one optimizer update, EMA threaded through the carry) must match an
    eager Python loop over the same microbatches doing exactly that."""
    import optax

    from vqvae2_tpu.train.vqvae import (LATENT_LOSS_WEIGHT, create_state,
                                        make_train_step)

    model = VQVAE(channel=16, n_res_block=1, n_res_channel=8, embed_dim=8,
                  n_embed=16)
    tx = optax.adam(1e-3)
    x = jnp.asarray(rng.normal(size=(8, 32, 32, 3)), jnp.float32)
    xs = x.reshape(4, 2, 32, 32, 3)

    # eager sequential reference
    def loss_fn(params, vq_stats, xm):
        (dec, diff), nv = model.apply(
            {"params": params, "vq_stats": vq_stats}, xm,
            train=True, mutable=["vq_stats"])
        recon = jnp.mean(jnp.square(dec - xm))
        return recon + LATENT_LOSS_WEIGHT * diff, nv["vq_stats"]

    state = create_state(model, tx, jax.random.PRNGKey(0), (1, 32, 32, 3))
    vq, losses = state.vq_stats, []
    gsum = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    for m in range(4):
        (loss, vq), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, vq, xs[m])
        gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
        losses.append(float(loss))
    grads = jax.tree_util.tree_map(lambda g: g / 4, gsum)
    updates, _ = tx.update(grads, state.opt_state, state.params)
    ref_params = optax.apply_updates(state.params, updates)

    state = create_state(model, tx, jax.random.PRNGKey(0), (1, 32, 32, 3))
    acc_state, m_acc = make_train_step(model, tx, grad_accum=4)(state, xs)

    np.testing.assert_allclose(float(m_acc["loss"]), np.mean(losses),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ref_params),
                    jax.tree_util.tree_leaves(acc_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(vq),
                    jax.tree_util.tree_leaves(acc_state.vq_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_reid_grad_accum_matches_sequential_reference(rng):
    """The ReID trainer's grad_accum scan (summed/averaged grads, BN stats
    through the carry, per-microbatch dropout keys) must reproduce an eager
    loop over the same P×K microbatches followed by one SGD update — the
    second consumer of the remote-compile microbatching workaround."""
    import optax

    from vqvae2_tpu.part.part_model import EmbedNet2
    from vqvae2_tpu.train.reid import ReidState, make_loss_fn, make_train_step

    n_ids, num_pos, hw, accum = 2, 2, (48, 24), 2
    rows = n_ids * num_pos
    model = EmbedNet2(class_num=n_ids, arch="resnet18")
    tx = optax.sgd(0.01)
    probe = jnp.zeros((1, *hw, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), xRGB=probe, xIR=probe,
                           xZ=probe, modal=0, train=True)

    def mkbatch(seed):
        r = np.random.default_rng(seed)
        imgs = lambda: r.normal(size=(rows, *hw, 3)).astype(np.float32)
        parts = lambda: r.integers(0, 7, size=(rows, *hw)).astype(np.int32)
        return {"rgb": imgs(), "ir": imgs(), "gray": imgs(),
                "label": np.repeat(np.arange(n_ids, dtype=np.int32), num_pos),
                "part1": parts(), "part2": parts()}

    micros = [jax.tree_util.tree_map(jnp.asarray, mkbatch(s)) for s in (1, 2)]
    stacked = {k: jnp.stack([b[k] for b in micros]) for k in micros[0]}
    key = jax.random.PRNGKey(7)
    state = ReidState(step=jnp.zeros((), jnp.int32),
                      params=variables["params"],
                      batch_stats=variables["batch_stats"],
                      opt_state=tx.init(variables["params"]))

    # eager reference: per-microbatch grads at the SAME params, with the
    # SAME folded dropout keys the scan uses, then one averaged SGD update
    loss_fn = make_loss_fn(model, num_pos, n_ids, hw)
    folded = jax.random.fold_in(key, 0)  # fold_in(rng, state.step=0)
    bstats, losses = state.batch_stats, []
    gsum = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    for i, b in enumerate(micros):
        (loss, (bstats, _)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, bstats, b,
                                   jax.random.fold_in(folded, i))
        gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
        losses.append(float(loss))
    grads = jax.tree_util.tree_map(lambda g: g / accum, gsum)
    updates, _ = tx.update(grads, state.opt_state, state.params)
    ref_params = optax.apply_updates(state.params, updates)

    acc_state, m_acc = make_train_step(model, tx, num_pos, n_ids, hw,
                                       grad_accum=accum)(state, stacked, key)

    np.testing.assert_allclose(float(m_acc["loss"]), np.mean(losses),
                               rtol=1e-5)
    # atol 1e-5: the scan sums microbatch grads in a different association
    # order than the eager loop, so fp32 drift of a few e-6 on ~1e-3-magnitude
    # params is expected (observed max 2.8e-6); anything structural would
    # miss by orders of magnitude.
    for a, b in zip(jax.tree_util.tree_leaves(ref_params),
                    jax.tree_util.tree_leaves(acc_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(bstats),
                    jax.tree_util.tree_leaves(acc_state.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_grad_accum_advances_ema_per_microbatch(rng):
    """With a live EMA (decay<1) the codebook stats must advance through the
    scan carry — K microbatches move them further than one."""
    import optax

    from vqvae2_tpu.train.vqvae import create_state, make_train_step

    model = VQVAE(channel=16, n_res_block=1, n_res_channel=8, embed_dim=8,
                  n_embed=16, decay=0.5)
    tx = optax.adam(1e-3)
    x = jnp.asarray(rng.normal(size=(8, 32, 32, 3)), jnp.float32)

    state = create_state(model, tx, jax.random.PRNGKey(0), (1, 32, 32, 3))
    before = np.asarray(state.vq_stats["quantize_t"]["cluster_size"]).copy()
    new_state, m = make_train_step(model, tx, grad_accum=2)(
        state, x.reshape(2, 4, 32, 32, 3))
    after = np.asarray(new_state.vq_stats["quantize_t"]["cluster_size"])
    assert np.isfinite(float(m["loss"]))
    assert not np.allclose(before, after)


def test_quantize_perplexity_sown(rng):
    m = Quantize(dim=8, n_embed=16)
    x = jnp.asarray(rng.normal(size=(4, 4, 4, 8)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    (q, diff, idx), nv = m.apply(v, x, train=True,
                                 mutable=["vq_stats", "intermediates"])
    perp = float(nv["intermediates"]["perplexity"][0])
    assert 1.0 <= perp <= 16.0


def test_dead_code_restart(rng):
    """With a huge restart threshold every code is 'dead' → embeds re-seed
    from batch vectors; with 0 threshold embeds follow plain EMA."""
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 8)), jnp.float32)

    m0 = Quantize(dim=8, n_embed=16, restart_threshold=0.0)
    v0 = m0.init(jax.random.PRNGKey(0), x)
    _, nv0 = m0.apply(v0, x, train=True, mutable=["vq_stats", "intermediates"])

    m1 = Quantize(dim=8, n_embed=16, restart_threshold=1e9)
    _, nv1 = m1.apply(v0, x, train=True, mutable=["vq_stats", "intermediates"])

    e0 = np.asarray(nv0["vq_stats"]["embed"])
    e1 = np.asarray(nv1["vq_stats"]["embed"])
    assert not np.allclose(e0, e1)
    # restarted embeds are actual batch vectors
    flat = np.asarray(x).reshape(-1, 8)
    assert np.allclose(e1[0], flat[0], atol=1e-6)
    # cluster sizes reset to 1
    np.testing.assert_allclose(np.asarray(nv1["vq_stats"]["cluster_size"]),
                               1.0)


@pytest.mark.slow
def test_remat_matches_plain(rng):
    """remat=True must be numerically identical (fwd and grads) — it only
    changes what the backward recomputes."""
    import optax

    from vqvae2_tpu.train.vqvae import create_state, make_train_step

    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    outs = []
    for remat in (False, True):
        model = VQVAE(channel=16, n_res_block=1, n_res_channel=8, embed_dim=8,
                      n_embed=16, remat=remat)
        tx = optax.adam(1e-3)
        state = create_state(model, tx, jax.random.PRNGKey(0), (1, 32, 32, 3))
        step = make_train_step(model, tx)
        new_state, m = step(state, x)
        outs.append((float(m["loss"]),
                     np.asarray(jax.tree_util.tree_leaves(new_state.params)[0])))
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-6)
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-5, atol=1e-7)
