"""inplace-ABN tests: forward parity with composed BN+act, gradient parity
with autodiff through the unfused expression (the custom_vjp must equal the
true derivative), |w|+eps transform, activation inversion, and sync semantics
under shard_map."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae2_tpu.ops.inplace_abn import (
    ACT_ELU,
    ACT_LEAKY_RELU,
    ACT_NONE,
    batch_moments,
    inplace_abn,
)
from vqvae2_tpu.models.abn import InPlaceABN


def unfused(x, weight, bias, mean, var, eps=1e-5, activation=ACT_LEAKY_RELU,
            slope=0.01):
    """Plain-JAX reference expression (autodiff ground truth)."""
    w_t = jnp.abs(weight) + eps
    y = (x - mean) * jax.lax.rsqrt(var + eps) * w_t + bias
    if activation == ACT_LEAKY_RELU:
        return jnp.where(y >= 0, y, slope * y)
    if activation == ACT_ELU:
        return jnp.where(y >= 0, y, jnp.expm1(y))
    return y


@pytest.mark.parametrize("activation", [ACT_LEAKY_RELU, ACT_ELU, ACT_NONE])
def test_forward_matches_unfused(activation, rng):
    c = 16
    x = jnp.asarray(rng.normal(size=(4, 5, 5, c)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(c,)), jnp.float32)  # includes negatives
    b = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    mean, var = batch_moments(x)
    z = inplace_abn(x, w, b, mean, var, 1e-5, activation, 0.01, None, True)
    ref = unfused(x, w, b, mean, var, activation=activation)
    np.testing.assert_allclose(np.asarray(z), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float16])
@pytest.mark.parametrize("activation", [ACT_LEAKY_RELU, ACT_ELU])
def test_low_precision_matches_fp32(activation, dtype, rng):
    """Half-kernel parity (reference inplace_abn_cuda_half.cu:14-275):
    bf16/fp16 inputs compute with fp32 per-channel math, moments and grad
    sums accumulate in fp32, and outputs/cotangents come back in the input
    dtype."""
    c = 32
    x32 = jnp.asarray(rng.normal(size=(8, 7, 5, c)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(c,)) + 0.5, jnp.float32)
    b = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    xlp = x32.astype(dtype)

    # fp32-accumulated moments: bit-identical whether fed lp-cast-to-f32 or lp
    m_lp, v_lp = batch_moments(xlp)
    m_ref, v_ref = batch_moments(xlp.astype(jnp.float32))
    assert m_lp.dtype == jnp.float32 and v_lp.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(m_lp), np.asarray(m_ref))
    np.testing.assert_array_equal(np.asarray(v_lp), np.asarray(v_ref))

    def fused_loss(x, w, b):
        mean, var = batch_moments(x)
        z = inplace_abn(x, w, b, jax.lax.stop_gradient(mean),
                        jax.lax.stop_gradient(var), 1e-5, activation, 0.01,
                        None, True)
        assert z.dtype == x.dtype
        return jnp.sum(jnp.sin(z.astype(jnp.float32))), z

    def unfused_lp_loss(x, w, b):
        # same lp rounding points as the fused op: fp32 channel math, store
        # narrowed to the input dtype (branch decisions therefore agree);
        # moments stay differentiable — the fused vjp folds their
        # x-dependence into the edz/eydz terms
        mean, var = batch_moments(x)
        z = unfused(x.astype(jnp.float32), w, b, mean, var,
                    activation=activation).astype(x.dtype)
        return jnp.sum(jnp.sin(z.astype(jnp.float32))), z

    (l32, z32), _ = jax.value_and_grad(fused_loss, argnums=(0, 1, 2),
                                       has_aux=True)(x32, w, b)
    (llp, zlp), glp = jax.value_and_grad(fused_loss, argnums=(0, 1, 2),
                                         has_aux=True)(xlp, w, b)
    _, gu = jax.value_and_grad(unfused_lp_loss, argnums=(0, 1, 2),
                               has_aux=True)(xlp, w, b)

    tol = 0.03 if dtype == jnp.bfloat16 else 0.004
    # lp forward tracks the fp32 forward within the dtype's precision
    np.testing.assert_allclose(np.asarray(zlp, np.float32), np.asarray(z32),
                               atol=tol, rtol=tol)
    assert glp[0].dtype == dtype, "dx must come back in the input dtype"
    assert glp[1].dtype == jnp.float32 and glp[2].dtype == jnp.float32, \
        "fp32 params keep fp32 (fp32-accumulated) grads"
    # the fused bwd (inverting the lp-stored z) tracks autodiff through the
    # SAME lp expression — the valid ground truth: near the activation kink
    # an lp round can legitimately flip the branch vs the fp32 run
    for a, (f, u) in zip("xwb", zip(glp, gu)):
        f = np.asarray(f, np.float32)
        u = np.asarray(u, np.float32)
        assert np.isfinite(f).all(), f"lp grad d{a} has non-finite entries"
        scale = np.abs(u).max() + 1e-6
        if a == "x":
            # elementwise dx: the inversion trick is lossy near activation
            # asymptotes in low precision (z rounds toward the elu pole) —
            # tolerate isolated outliers, bound the bulk tightly
            bad = np.abs(f - u) > 3 * tol * (scale + np.abs(u))
            assert bad.mean() < 1e-3, (
                f"lp grad dx: {bad.sum()}/{bad.size} outliers")
        else:
            np.testing.assert_allclose(f, u, rtol=3 * tol, atol=3 * tol * scale,
                                       err_msg=f"lp grad d{a} mismatch")


@pytest.mark.parametrize("activation", [ACT_LEAKY_RELU, ACT_ELU, ACT_NONE])
def test_gradients_match_autodiff(activation, rng):
    """dx/dw/db from the custom vjp (which includes the batch-moment
    contribution via the edz/eydz terms) must equal autodiff through the FULL
    expression including moments as functions of x."""
    c = 8
    x = jnp.asarray(rng.normal(size=(2, 3, 3, c)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(c,)) + 0.5, jnp.float32)
    b = jnp.asarray(rng.normal(size=(c,)), jnp.float32)

    def fused_loss(x, w, b):
        mean, var = batch_moments(x)
        # moments passed explicitly but their x-dependence is inside the vjp
        z = inplace_abn(x, w, b, jax.lax.stop_gradient(mean),
                        jax.lax.stop_gradient(var), 1e-5, activation, 0.01,
                        None, True)
        return jnp.sum(jnp.sin(z))

    def unfused_loss(x, w, b):
        mean, var = batch_moments(x)  # differentiable moments
        z = unfused(x, w, b, mean, var, activation=activation)
        return jnp.sum(jnp.sin(z))

    gf = jax.grad(fused_loss, argnums=(0, 1, 2))(x, w, b)
    gu = jax.grad(unfused_loss, argnums=(0, 1, 2))(x, w, b)
    for a, (f, u) in zip("xwb", zip(gf, gu)):
        np.testing.assert_allclose(np.asarray(f), np.asarray(u), rtol=2e-4,
                                   atol=2e-5, err_msg=f"grad d{a} mismatch")


def test_eval_mode_gradient(rng):
    """Eval mode: moments are constants → dx = dz·act'·w̃·rstd (edz/eydz=0,
    reference functions.py:127-133)."""
    c = 4
    x = jnp.asarray(rng.normal(size=(2, 3, 3, c)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(c,)) + 1.0, jnp.float32)
    b = jnp.zeros((c,))
    mean = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    var = jnp.asarray(rng.uniform(0.5, 2.0, size=(c,)), jnp.float32)

    def fused(x):
        return jnp.sum(inplace_abn(x, w, b, mean, var, 1e-5, ACT_LEAKY_RELU,
                                   0.01, None, False))

    def ref(x):
        return jnp.sum(unfused(x, w, b, mean, var))

    np.testing.assert_allclose(np.asarray(jax.grad(fused)(x)),
                               np.asarray(jax.grad(ref)(x)),
                               rtol=1e-5, atol=1e-6)


def test_module_running_stats(rng):
    m = InPlaceABN(num_features=8)
    x = jnp.asarray(rng.normal(loc=2.0, scale=3.0, size=(4, 5, 5, 8)), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    z, nv = m.apply(variables, x, train=True, mutable=["batch_stats"])
    bs = nv["batch_stats"]
    mean, var = batch_moments(x)
    count = x.size // 8
    np.testing.assert_allclose(np.asarray(bs["running_mean"]),
                               0.1 * np.asarray(mean), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(bs["running_var"]),
        0.9 * 1.0 + 0.1 * np.asarray(var) * count / (count - 1), rtol=1e-5)
    # train output standardized (w=1,b=0 init, leaky on mostly-positive data)
    # eval path uses running stats
    z_eval = m.apply({**variables, "batch_stats": bs}, x, train=False)
    assert z_eval.shape == x.shape


@pytest.mark.slow
def test_sync_abn_shard_map(devices):
    """Under shard_map, the synced moments must equal global moments: per-device
    outputs concat == single-device output on the full batch."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    c = 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(16, 3, 3, c)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(c,)) + 1.0, jnp.float32)
    b = jnp.asarray(rng.normal(size=(c,)), jnp.float32)

    mesh = Mesh(np.asarray(devices), ("data",))

    def local_fn(x, w, b):
        mean, var = batch_moments(x, axis_name="data")
        return inplace_abn(x, w, b, mean, var, 1e-5, ACT_LEAKY_RELU, 0.01,
                           "data", True)

    z_sharded = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P("data"), P(), P()), out_specs=P("data"),
    )(x, w, b)

    mean, var = batch_moments(x)
    z_global = inplace_abn(x, w, b, mean, var, 1e-5, ACT_LEAKY_RELU, 0.01,
                           None, True)
    np.testing.assert_allclose(np.asarray(z_sharded), np.asarray(z_global),
                               rtol=1e-5, atol=1e-5)

    # gradients also match: global-mean loss through shard_map vs direct
    def loss_sharded(x, w, b):
        return jnp.mean(shard_map(
            local_fn, mesh=mesh,
            in_specs=(P("data"), P(), P()), out_specs=P("data"))(x, w, b) ** 2)

    def loss_global(x, w, b):
        mean, var = batch_moments(x)
        return jnp.mean(inplace_abn(x, w, b, mean, var, 1e-5, ACT_LEAKY_RELU,
                                    0.01, None, True) ** 2)

    gs = jax.grad(loss_sharded, argnums=(0, 1, 2))(x, w, b)
    gg = jax.grad(loss_global, argnums=(0, 1, 2))(x, w, b)
    for a, (s, g) in zip("xwb", zip(gs, gg)):
        np.testing.assert_allclose(np.asarray(s), np.asarray(g), rtol=1e-4,
                                   atol=1e-5, err_msg=f"sync grad d{a}")
