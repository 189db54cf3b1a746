"""Flash-attention kernel parity and semantics.

The Pallas kernel (vqvae2_tpu/ops/flash_attention.py) replaces the
full-matrix causal attention of the reference (pixelsnail.py:182-234).  On
the CPU test mesh the kernel runs in Pallas interpret mode (dropout-free
paths only — the TPU core PRNG has no interpreter); hardware runs are
covered by scripts/tpu_checks.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae2_tpu.ops.flash_attention import (causal_attention_reference,
                                            causal_flash_attention)


def _qkv(rng, b, h, n, d):
    return tuple(jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
                 for _ in range(3))


@pytest.mark.parametrize("shape", [(2, 2, 128, 16), (1, 4, 256, 32),
                                   (2, 1, 64, 64)])
def test_flash_matches_reference(shape):
    rng = np.random.default_rng(0)
    q, k, v = _qkv(rng, *shape)
    out_f = causal_flash_attention(q, k, v, block=64, interpret=True)
    out_r = causal_attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               atol=2e-5, rtol=2e-5)


def test_flash_row0_is_exactly_zero():
    rng = np.random.default_rng(1)
    q, k, v = _qkv(rng, 2, 2, 128, 16)
    out = causal_flash_attention(q, k, v, block=64, interpret=True)
    assert np.all(np.asarray(out[:, :, 0]) == 0.0)


def test_flash_strict_causality():
    """Output at position i must not depend on keys/values at j >= i
    (reference tril(k=-1) mask, pixelsnail.py:188-192)."""
    rng = np.random.default_rng(2)
    q, k, v = _qkv(rng, 1, 2, 128, 16)
    out = causal_flash_attention(q, k, v, block=64, interpret=True)
    i = 70
    k2 = k.at[:, :, i:].set(999.0)
    v2 = v.at[:, :, i:].set(-999.0)
    out2 = causal_flash_attention(q, k2, v2, block=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out[:, :, : i + 1]),
                               np.asarray(out2[:, :, : i + 1]),
                               atol=1e-6)
    assert not np.allclose(np.asarray(out[:, :, i + 1:]),
                           np.asarray(out2[:, :, i + 1:]))


def test_flash_grads_match_reference():
    rng = np.random.default_rng(3)
    q, k, v = _qkv(rng, 1, 2, 128, 16)

    def f_flash(q, k, v):
        return jnp.sum(jnp.sin(causal_flash_attention(q, k, v, block=64,
                                                      interpret=True)))

    def f_ref(q, k, v):
        return jnp.sum(jnp.sin(causal_attention_reference(q, k, v)))

    gf = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)


def test_flash_uneven_block_autoshrinks():
    rng = np.random.default_rng(4)
    q, k, v = _qkv(rng, 1, 1, 96, 16)  # 96 not divisible by 64 -> shrink
    out_f = causal_flash_attention(q, k, v, block=64, interpret=True)
    out_r = causal_attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               atol=2e-5, rtol=2e-5)


def test_reference_dropout_statistics():
    rng = np.random.default_rng(5)
    q, k, v = _qkv(rng, 1, 2, 64, 16)
    nodrop = causal_attention_reference(q, k, v)
    acc = jnp.zeros_like(nodrop)
    n_seed = 48
    for s in range(n_seed):
        acc = acc + causal_attention_reference(
            q, k, v, dropout_rate=0.5, dropout_rng=jax.random.PRNGKey(s))
    rel = (jnp.mean(jnp.abs(acc / n_seed - nodrop))
           / jnp.mean(jnp.abs(nodrop)))
    assert float(rel) < 0.25  # ~1/sqrt(48) sampling noise


def test_flash_spmd_batch_sharding():
    """Under a sharded mesh the kernel must partition over batch·head via its
    custom_partitioning rule — not silently all-gather (a custom call is
    opaque to GSPMD without it)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()), ("data",))
    rng = np.random.default_rng(8)
    q, k, v = _qkv(rng, 8, 2, 128, 16)
    sh = NamedSharding(mesh, P("data", None, None, None))
    qs, ks, vs = (jax.device_put(t, sh) for t in (q, k, v))

    f = jax.jit(lambda q, k, v: causal_flash_attention(q, k, v, block=64,
                                                       interpret=True))
    out = f(qs, ks, vs)
    ref = causal_attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    assert out.sharding.spec[0] == "data"
    assert "all-gather" not in f.lower(qs, ks, vs).compile().as_text()

    g = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(jnp.sin(causal_flash_attention(
            q, k, v, block=64, interpret=True))), argnums=(0, 1, 2)))
    gs = g(qs, ks, vs)
    gr = jax.grad(
        lambda q, k, v: jnp.sum(jnp.sin(causal_attention_reference(q, k, v))),
        argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gs, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)


def test_spmd_dropout_seed_is_shard_distinct():
    """Batch shards must draw independent dropout streams: the per-shard
    lowering folds the shard's mesh position into the seed.  The TPU core
    PRNG has no interpreter, so this drives the fold through the real
    _make_spmd machinery with a dummy kernel that reports the seed each
    shard actually received."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from vqvae2_tpu.ops.flash_attention import _make_spmd

    devices = jax.devices()
    mesh = Mesh(np.array(devices), ("data",))

    def report_seed(x, seed):
        return jnp.zeros_like(x) + seed[0]

    wrapped = _make_spmd(1, 1, 0, report_seed, "b n d, s -> b n d")
    x = jnp.zeros((2 * len(devices), 8, 8), jnp.int32)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
    out = np.asarray(jax.jit(wrapped)(xs, jnp.array([42], jnp.int32)))

    per_shard = out.reshape(len(devices), -1)
    assert all(len(np.unique(row)) == 1 for row in per_shard)
    seeds = per_shard[:, 0]
    assert len(np.unique(seeds)) == len(devices), seeds
    for i, s in enumerate(seeds):
        exp = (42 + i * 0x632BE5AB) & 0xFFFFFFFF
        exp = exp - 2 ** 32 if exp >= 2 ** 31 else exp
        assert s == exp, (i, s, exp)


def test_non_multiple_of_8_length_raises():
    rng = np.random.default_rng(9)
    q, k, v = _qkv(rng, 1, 1, 100, 16)
    with pytest.raises(ValueError, match="multiple of 8"):
        causal_flash_attention(q, k, v, block=64, interpret=True)


def test_module_uses_kernel_semantics():
    """CausalAttention module output is invariant to future-pixel changes
    regardless of backend path."""
    from vqvae2_tpu.models.pixelsnail import CausalAttention

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 32)).astype(np.float32))
    mod = CausalAttention(32, n_head=4, dropout=0.0)
    variables = mod.init(jax.random.PRNGKey(0), x, x)
    out = mod.apply(variables, x, x)
    x2 = x.at[:, 7, 7].set(100.0)
    out2 = mod.apply(variables, x2, x2)
    np.testing.assert_allclose(np.asarray(out[:, :7]), np.asarray(out2[:, :7]),
                               atol=1e-5)
