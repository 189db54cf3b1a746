"""FSDP sharding helper + codebook-health extras."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae2_tpu import parallel as par
from vqvae2_tpu.models.vqvae import Quantize, VQVAE


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
