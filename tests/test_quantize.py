"""Unit tests for the fused nearest-code op and the EMA quantizer module.

Ground truth is independent numpy brute force (full (N, K) L2 distance
matrix), matching the reference math at vqvae.py:43-70."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae2_tpu.ops.quantize import (
    nearest_code,
    nearest_code_reference,
    quantize_lookup,
)
from vqvae2_tpu.models.vqvae import Quantize


def brute_force(flat, embed):
    d = ((flat[:, None, :] - embed[None, :, :]) ** 2).sum(-1)  # (N, K)
    idx = d.argmin(1)
    return idx, embed[idx]


def assert_indices_equal_modulo_fp_ties(got, want, flat, embed, tol=1e-4):
    """Indices must match except where the two codes are equidistant to fp
    precision (accumulation-order ties can break either way)."""
    got, want = np.asarray(got), np.asarray(want)
    mism = np.nonzero(got != want)[0]
    for i in mism:
        d_got = ((flat[i] - embed[got[i]]) ** 2).sum()
        d_want = ((flat[i] - embed[want[i]]) ** 2).sum()
        assert abs(d_got - d_want) <= tol * max(d_got, d_want, 1e-12), (
            f"row {i}: idx {got[i]} (d={d_got}) vs {want[i]} (d={d_want})"
        )


def test_nearest_code_matches_brute_force(rng):
    flat = rng.normal(size=(257, 64)).astype(np.float32)
    embed = rng.normal(size=(512, 64)).astype(np.float32)
    idx, q, csum, esum = jax.jit(nearest_code)(flat, embed)
    ref_idx, ref_q = brute_force(flat, embed)
    assert_indices_equal_modulo_fp_ties(idx, ref_idx, flat, embed)
    same = np.asarray(idx) == ref_idx
    np.testing.assert_allclose(np.asarray(q)[same], ref_q[same], rtol=1e-5, atol=1e-5)


def test_nearest_code_stats(rng):
    flat = rng.normal(size=(300, 16)).astype(np.float32)
    embed = rng.normal(size=(32, 16)).astype(np.float32)
    idx, q, csum, esum = nearest_code_reference(flat, embed)
    idx = np.asarray(idx)
    onehot = np.eye(32, dtype=np.float32)[idx]
    np.testing.assert_allclose(np.asarray(csum), onehot.sum(0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(esum), onehot.T @ flat, rtol=1e-4, atol=1e-4)


def test_quantize_lookup(rng):
    embed = rng.normal(size=(32, 8)).astype(np.float32)
    idx = rng.integers(0, 32, size=(4, 5, 6))
    out = quantize_lookup(jnp.asarray(idx), jnp.asarray(embed))
    np.testing.assert_allclose(np.asarray(out), embed[idx])


def test_quantize_module_forward_and_ema(rng):
    """EMA update parity with hand-rolled numpy (reference vqvae.py:54-70)."""
    dim, k, decay, eps = 8, 16, 0.99, 1e-5
    m = Quantize(dim=dim, n_embed=k, decay=decay, eps=eps)
    x = rng.normal(size=(2, 4, 4, dim)).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    assert "params" not in variables or not variables["params"]  # buffers only

    stats = variables["vq_stats"]
    (q, diff, idx), new_vars = m.apply(
        variables, jnp.asarray(x), train=True, mutable=["vq_stats"]
    )
    assert q.shape == x.shape and idx.shape == x.shape[:-1]

    # numpy reference EMA
    embed = np.asarray(stats["embed"])
    flat = x.reshape(-1, dim)
    ridx, rq = brute_force(flat, embed)
    onehot = np.eye(k, dtype=np.float32)[ridx]
    np.testing.assert_array_equal(np.asarray(idx).reshape(-1), ridx)

    new_cluster = np.asarray(stats["cluster_size"]) * decay + (1 - decay) * onehot.sum(0)
    new_avg = np.asarray(stats["embed_avg"]) * decay + (1 - decay) * (onehot.T @ flat)
    n = new_cluster.sum()
    smoothed = (new_cluster + eps) / (n + k * eps) * n
    new_embed = new_avg / smoothed[:, None]

    ns = new_vars["vq_stats"]
    np.testing.assert_allclose(np.asarray(ns["cluster_size"]), new_cluster, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ns["embed_avg"]), new_avg, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ns["embed"]), new_embed, rtol=1e-4)

    # diff = mean((sg(q) - x)^2)
    np.testing.assert_allclose(
        float(diff), ((rq.reshape(x.shape) - x) ** 2).mean(), rtol=1e-4
    )


def test_quantize_straight_through_gradient(rng):
    """d(output)/d(input) must be identity through the quantizer
    (reference straight-through estimator, vqvae.py:73)."""
    m = Quantize(dim=4, n_embed=8)
    x = jnp.asarray(rng.normal(size=(1, 2, 2, 4)).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)

    def f(x):
        q, diff, _ = m.apply(variables, x)
        return jnp.sum(q * 3.0)

    g = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g), 3.0 * np.ones_like(x), rtol=1e-6)


def test_quantize_eval_mode_keeps_stats(rng):
    m = Quantize(dim=4, n_embed=8)
    x = jnp.asarray(rng.normal(size=(1, 2, 2, 4)).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    _, new_vars = m.apply(variables, x, train=False, mutable=["vq_stats"])
    for name in ("embed", "cluster_size", "embed_avg"):
        np.testing.assert_array_equal(
            np.asarray(new_vars["vq_stats"][name]),
            np.asarray(variables["vq_stats"][name]),
        )


def test_nearest_code_pallas_interpret_matches_reference(rng):
    """Run the Pallas kernel in interpreter mode on CPU and compare."""
    from jax.experimental.pallas import tpu as pltpu
    from vqvae2_tpu.ops import quantize as qz

    flat = jnp.asarray(rng.normal(size=(130, 64)).astype(np.float32))
    embed = jnp.asarray(rng.normal(size=(512, 64)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        idx, q, csum, esum = qz._nearest_code_pallas(flat, embed, block_n=128)
    ridx, rq, rcsum, resum = nearest_code_reference(flat, embed)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ridx))
    np.testing.assert_allclose(np.asarray(q), np.asarray(rq), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(csum), np.asarray(rcsum), atol=1e-3)
    np.testing.assert_allclose(np.asarray(esum), np.asarray(resum), rtol=1e-4, atol=1e-4)


def test_nearest_code_spmd_row_sharding(rng):
    """Under a sharded mesh the quantizer kernel must row-partition and
    psum its EMA stats (custom_partitioning — a custom call is otherwise
    opaque to GSPMD and would all-gather the global rows)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from vqvae2_tpu.ops import quantize as qz

    mesh = Mesh(np.array(jax.devices()), ("data",))
    flat = jnp.asarray(rng.normal(size=(1024, 64)).astype(np.float32))
    embed = jnp.asarray(rng.normal(size=(512, 64)).astype(np.float32))
    fs = jax.device_put(flat, NamedSharding(mesh, P("data", None)))
    es = jax.device_put(embed, NamedSharding(mesh, P(None, None)))

    f = jax.jit(lambda f_, e_: qz._nearest_code_pallas_spmd(f_, e_, 128, True))
    idx, q, csum, esum = f(fs, es)
    ridx, rq, rcsum, resum = nearest_code_reference(flat, embed)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ridx))
    np.testing.assert_array_equal(
        np.asarray(q), np.asarray(jnp.take(embed, idx, axis=0)))
    np.testing.assert_allclose(np.asarray(csum), np.asarray(rcsum), atol=1e-3)
    np.testing.assert_allclose(np.asarray(esum), np.asarray(resum),
                               rtol=1e-4, atol=1e-4)
    assert idx.sharding.spec[0] == "data"          # rows stayed sharded
    txt = f.lower(fs, es).compile().as_text()
    assert "all-gather" not in txt                 # no forced replication
    assert "all-reduce" in txt                     # stats psum present

    ids = jax.jit(lambda f_, e_: qz._nearest_code_pallas_ids_spmd(
        f_, e_, 128, True))(fs, es)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ridx))


def test_vmem_block_cap():
    from vqvae2_tpu.ops.quantize import _vmem_block_cap

    # flagship config keeps the full tile (bench-path perf unchanged)
    assert _vmem_block_cap(64, 512) == 2048
    # deep config (d=256) overflowed the 16 MB scoped-VMEM stack at 2048
    # (measured 19.14 MB on v5e); the cap must shrink the tile
    assert _vmem_block_cap(256, 512) <= 1024
    # modeled footprint stays under the 16 MB hardware limit everywhere
    for d in (32, 64, 128, 256, 512):
        for k in (256, 512, 1024):
            b = _vmem_block_cap(d, k)
            per_row = 16 * d + 6 * k + 6 * d + 32
            assert b * per_row + 14 * k * d + 8 * k < 16 * 2 ** 20, (d, k, b)
            assert b >= 8
