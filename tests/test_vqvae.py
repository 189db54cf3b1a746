"""VQVAE model tests: shapes, hierarchy geometry, decode_code round-trip,
gradient flow, and SPMD (8-device sharded batch) consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae2_tpu.models.vqvae import VQVAE, Encoder, Decoder
from vqvae2_tpu import parallel as par


@pytest.fixture(scope="module")
def small_vqvae():
    model = VQVAE(channel=32, n_res_block=1, n_res_channel=8, embed_dim=16, n_embed=32)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables


def test_encoder_decoder_geometry():
    enc4 = Encoder(channel=16, n_res_block=1, n_res_channel=8, stride=4)
    x = jnp.zeros((1, 64, 64, 3))
    v = enc4.init(jax.random.PRNGKey(0), x)
    y = enc4.apply(v, x)
    assert y.shape == (1, 16, 16, 16)

    enc2 = Encoder(channel=16, n_res_block=1, n_res_channel=8, stride=2)
    y2 = enc2.apply(enc2.init(jax.random.PRNGKey(0), y), y)
    assert y2.shape == (1, 8, 8, 16)

    dec4 = Decoder(out_channel=3, channel=16, n_res_block=1, n_res_channel=8, stride=4)
    z = dec4.apply(dec4.init(jax.random.PRNGKey(0), y), y)
    assert z.shape == (1, 64, 64, 3)


def test_vqvae_forward_shapes(small_vqvae):
    model, variables = small_vqvae
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 64, 64, 3)), jnp.float32)
    dec, diff = model.apply(variables, x)
    assert dec.shape == x.shape
    assert diff.shape == ()

    # hierarchy geometry: top = H/8, bottom = H/4 (reference vqvae.py:223-240)
    qt, qb, diff, id_t, id_b = model.apply(variables, x, method=model.encode)
    assert qt.shape == (2, 8, 8, 16)
    assert qb.shape == (2, 16, 16, 16)
    assert id_t.shape == (2, 8, 8) and id_t.dtype == jnp.int32
    assert id_b.shape == (2, 16, 16)


def test_encode_ids_matches_encode(small_vqvae):
    """The indices-only extraction path must produce exactly the ids of the
    full encode (it skips only the unused quantized/stat outputs)."""
    model, variables = small_vqvae
    x = jnp.asarray(np.random.default_rng(7).normal(size=(2, 64, 64, 3)),
                    jnp.float32)
    _, _, _, id_t, id_b = model.apply(variables, x, method=model.encode)
    id_t2, id_b2 = model.apply(variables, x, method=model.encode_ids)
    assert np.array_equal(np.asarray(id_t), np.asarray(id_t2))
    assert np.array_equal(np.asarray(id_b), np.asarray(id_b2))


def test_decode_code_roundtrip(small_vqvae):
    """decode(quant) == decode_code(ids) — codes are a lossless latent record
    (the reference's extract_code.py→sample.py bridge relies on this)."""
    model, variables = small_vqvae
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 64, 64, 3)), jnp.float32)
    qt, qb, _, id_t, id_b = model.apply(variables, x, method=model.encode)
    dec_direct = model.apply(variables, qt, qb, method=model.decode)
    dec_codes = model.apply(variables, id_t, id_b, method=model.decode_code)
    np.testing.assert_allclose(
        np.asarray(dec_direct), np.asarray(dec_codes), rtol=1e-4, atol=1e-4
    )


def test_vqvae_train_grads_flow(small_vqvae):
    model, variables = small_vqvae
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 64, 64, 3)), jnp.float32)

    def loss_fn(params):
        (dec, diff), _ = model.apply(
            {"params": params, "vq_stats": variables["vq_stats"]},
            x, train=True, mutable=["vq_stats"],
        )
        return jnp.mean((dec - x) ** 2) + 0.25 * diff

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves, "no parameters"
    total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
    assert np.isfinite(total) and total > 0
    # every leaf finite
    for g in leaves:
        assert bool(jnp.all(jnp.isfinite(g)))


def test_vqvae_spmd_data_parallel(small_vqvae, devices):
    """Sharding the batch over 8 devices must give the same result as one
    device — GSPMD inserts the collectives (replaces reference DDP+all_reduce)."""
    model, variables = small_vqvae
    x = np.random.default_rng(4).normal(size=(8, 64, 64, 3)).astype(np.float32)

    mesh = par.make_mesh(devices)

    def step(variables, x):
        (dec, diff), new_vars = model.apply(
            variables, x, train=True, mutable=["vq_stats"]
        )
        return jnp.mean((dec - x) ** 2), diff, new_vars["vq_stats"]

    # single-device reference
    loss1, diff1, stats1 = jax.jit(step)(variables, jnp.asarray(x))

    # 8-way sharded
    xs = par.shard_batch(x, mesh)
    vrep = par.replicate(variables, mesh)
    loss8, diff8, stats8 = jax.jit(step)(vrep, xs)

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
    np.testing.assert_allclose(float(diff1), float(diff8), rtol=1e-5)
    for q in ("quantize_t", "quantize_b"):
        np.testing.assert_allclose(
            np.asarray(stats1[q]["cluster_size"]), np.asarray(stats8[q]["cluster_size"]),
            rtol=1e-4, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(stats1[q]["embed"]), np.asarray(stats8[q]["embed"]),
            rtol=1e-4, atol=1e-5,
        )


def test_encode_rejects_non_multiple_of_8():
    """The stride-2 top path must invert exactly; H,W % 8 != 0 now raises a
    clear error instead of a deep concat TypeError (round-1 rough edge)."""
    import pytest as _pytest

    model = VQVAE(channel=16, n_res_block=1, n_res_channel=8, embed_dim=8,
                  n_embed=16)
    x = jnp.zeros((1, 36, 40, 3), jnp.float32)
    with _pytest.raises(ValueError, match="divisible by 8"):
        model.init(jax.random.PRNGKey(0), x)
