"""Fused in-place activated batch norm (ABN) — the TPU-native equivalent of
the reference's C++/CUDA extension (reference ``part/modules/src/*``,
``part/modules/functions.py:77-242``), built as Pallas kernels + custom_vjp.

Semantics (verified against ``inplace_abn_cuda.cu``):

* forward:  ``z = act((x − μ) · rsqrt(σ² + eps) · (|w| + eps) + b)``
  (the |w|+eps weight transform is the reference's, ``inplace_abn_cuda.cu:114``)
* backward saves ONLY ``z`` (the output) — the invertible-activation trick
  (``inplace_abn_cuda.cu:283-307``): leaky-relu/elu are inverted elementwise
  to recover the pre-activation ``y``, then
  ``ŷ = (y − b)/(|w|+eps)``, ``edz = Σdz``, ``eydz = Σŷ·dz`` per channel, and
  ``dx = (dz − edz/n − ŷ·eydz/n) · (|w|+eps) · rsqrt(σ²+eps)``
  (``inplace_abn_cuda.cu:216-236``); ``dw = sign(w)·eydz``, ``db = edz``.

TPU mapping: the per-channel moments and grad sums are XLA reductions (they
fuse, and under GSPMD a batch-sharded input automatically all-reduces them —
the reference's ``dist.all_reduce`` of mean/var/edz/eydz,
``functions.py:173-226``; under shard_map pass ``axis_name``).  The two
elementwise passes are Pallas kernels: the backward fuses activation
inversion + dx into ONE pass where the reference runs thrust transform_if
twice plus a separate backward kernel (3 passes).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ACT_LEAKY_RELU = "leaky_relu"
ACT_ELU = "elu"
ACT_NONE = "none"
_ACTS = (ACT_LEAKY_RELU, ACT_ELU, ACT_NONE)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Elementwise math shared by Pallas and XLA paths
# ---------------------------------------------------------------------------

def _act_fwd(y, activation: str, slope: float):
    if activation == ACT_LEAKY_RELU:
        return jnp.where(y >= 0, y, slope * y)
    if activation == ACT_ELU:
        return jnp.where(y >= 0, y, jnp.expm1(y))
    return y


def _act_invert(z, dz, activation: str, slope: float):
    """Recover (y, dy) from (z, dz) — reference thrust transform_if pairs
    (inplace_abn_cuda.cu:283-307)."""
    if activation == ACT_LEAKY_RELU:
        neg = z < 0
        return jnp.where(neg, z / slope, z), jnp.where(neg, dz * slope, dz)
    if activation == ACT_ELU:
        neg = z < 0
        # clamp: low-precision storage can round z to exactly -1 (the elu
        # asymptote), where log1p(z) = -inf and dy = dz·(z+1) = 0 would
        # produce inf·0 NaNs in eydz; at the clamp the true contribution
        # is already ~0
        z_safe = jnp.maximum(z, jnp.asarray(-1.0 + 1e-6, z.dtype))
        return (jnp.where(neg, jnp.log1p(z_safe), z),
                jnp.where(neg, dz * (z_safe + 1.0), dz))
    return z, dz


# ---------------------------------------------------------------------------
# Pallas kernels (x flattened to (M, C); grid over M tiles; per-channel
# vectors broadcast from (1, C) blocks)
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, mean_ref, rstd_w_ref, bias_ref, z_ref,
                *, activation: str, slope: float):
    # Mixed-precision contract (reference inplace_abn_cuda_half.cu:14-275):
    # low-precision x with fp32 per-channel vectors computes in fp32 and
    # stores back in the input dtype.
    y = (x_ref[:] - mean_ref[:]) * rstd_w_ref[:] + bias_ref[:]
    z_ref[:] = _act_fwd(y, activation, slope).astype(z_ref.dtype)


def _bwd_kernel(z_ref, dz_ref, binv_ref, winv_ref, mul_ref, edzn_ref, eydzn_ref,
                dx_ref, *, activation: str, slope: float):
    # edzn/eydzn arrive pre-divided by the (possibly psum'd, traced) count.
    # fp32 compute regardless of storage dtype (half-kernel parity; also the
    # elu-inversion clamp in _act_invert needs fp32 headroom near z = -1).
    y, dy = _act_invert(z_ref[:].astype(jnp.float32),
                        dz_ref[:].astype(jnp.float32), activation, slope)
    yhat = (y - binv_ref[:]) * winv_ref[:]
    dx_ref[:] = ((dy - edzn_ref[:] - yhat * eydzn_ref[:])
                 * mul_ref[:]).astype(dx_ref.dtype)


def _pallas_elementwise(kernel, outs_dtype, x2d, *chan_vecs, block_m=1024):
    m, c = x2d.shape
    m_pad = _round_up(max(m, 8), block_m)
    if m_pad != m:
        x2d = jnp.pad(x2d, ((0, m_pad - m), (0, 0)))
    grid = (m_pad // block_m,)
    row_spec = pl.BlockSpec((block_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec] + [vec_spec] * len(chan_vecs),
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, c), outs_dtype),
    )(x2d, *(v.reshape(1, c) for v in chan_vecs))
    return out[:m]


def _pallas_bwd(z2d, dz2d, binv, winv, mul, edzn, eydzn, *, activation, slope,
                block_m=1024):
    m, c = z2d.shape
    m_pad = _round_up(max(m, 8), block_m)
    if m_pad != m:
        z2d = jnp.pad(z2d, ((0, m_pad - m), (0, 0)))
        dz2d = jnp.pad(dz2d, ((0, m_pad - m), (0, 0)))
    grid = (m_pad // block_m,)
    row_spec = pl.BlockSpec((block_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    dx = pl.pallas_call(
        functools.partial(_bwd_kernel, activation=activation, slope=slope),
        grid=grid,
        in_specs=[row_spec, row_spec] + [vec_spec] * 5,
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, c), z2d.dtype),
    )(z2d, dz2d, *(v.reshape(1, c) for v in (binv, winv, mul, edzn, eydzn)))
    return dx[:m]


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# SPMD partitioning: the Pallas launchers are custom calls, opaque to GSPMD —
# without a rule a sharded mesh would all-gather the global activations at
# every ABN. The row dim is embarrassingly parallel (moments/grad-sums are
# computed and psum'd *outside*, in partitionable XLA), so rows shard and the
# per-channel vectors replicate.
# ---------------------------------------------------------------------------

def _spmd_rowwise(fn, n_rows: int, n_vecs: int, n_static: int, rule: str):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    n_arrays = n_rows + n_vecs
    wrapped = custom_partitioning(
        fn, static_argnums=tuple(range(n_arrays, n_arrays + n_static)))

    def _row_axis(sharding):
        spec = getattr(sharding, "spec", PartitionSpec())
        return spec[0] if len(spec) else None

    def infer(*args):
        mesh, arg_shapes = args[-3], args[-2]
        axis = _row_axis(arg_shapes[0].sharding)
        return NamedSharding(mesh, PartitionSpec(axis, None))

    def partition(*args):
        mesh, arg_shapes, result_shape = args[-3:]
        static = args[:-3]
        axis = _row_axis(arg_shapes[0].sharding)
        row = NamedSharding(mesh, PartitionSpec(axis, None))
        vec = NamedSharding(mesh, PartitionSpec(None))
        arg_shardings = (row,) * n_rows + (vec,) * n_vecs

        def lower_fn(*arrays):
            return fn(*arrays, *static)

        return mesh, lower_fn, row, arg_shardings

    wrapped.def_partition(partition=partition,
                          infer_sharding_from_operands=infer,
                          sharding_rule=rule, decode_shardings=True)
    return wrapped


def _abn_fwd_launch(x2d, mean, rstd_w, b, activation, slope, out_dtype):
    return _pallas_elementwise(
        functools.partial(_fwd_kernel, activation=activation, slope=slope),
        out_dtype, x2d, mean, rstd_w, b)


def _abn_bwd_launch(z2d, dz2d, binv, winv, mul, edzn, eydzn, activation, slope):
    return _pallas_bwd(z2d, dz2d, binv, winv, mul, edzn, eydzn,
                       activation=activation, slope=slope)


_abn_fwd_spmd = _spmd_rowwise(
    _abn_fwd_launch, n_rows=1, n_vecs=3, n_static=3,
    rule="m c, c, c, c -> m c")
_abn_bwd_spmd = _spmd_rowwise(
    _abn_bwd_launch, n_rows=2, n_vecs=5, n_static=2,
    rule="m c, m c, c, c, c, c, c -> m c")


# ---------------------------------------------------------------------------
# The op: custom_vjp over (x, weight, bias) with explicit batch moments
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def inplace_abn(x, weight, bias, mean, var,
                eps: float = 1e-5, activation: str = ACT_LEAKY_RELU,
                slope: float = 0.01, axis_name: Optional[str] = None,
                training: bool = True):
    """Normalize+activate with the given per-channel moments.

    ``x``: (..., C) NHWC.  ``weight``/``bias`` may be None (affine off).
    The caller computes/syncs ``mean``/``var`` (see :func:`batch_moments`)
    and owns the running-stat update — this op is the fused compute core.
    """
    z, _ = _abn_fwd_impl(x, weight, bias, mean, var, eps, activation, slope)
    return z


def _abn_fwd_impl(x, weight, bias, mean, var, eps, activation, slope):
    c = x.shape[-1]
    affine = weight is not None
    # Per-channel vectors in fp32 regardless of x's dtype — the compute
    # happens in fp32 and only the store narrows (half-kernel parity,
    # inplace_abn_cuda_half.cu:14-275).
    f32 = jnp.float32
    w_t = (jnp.abs(weight).astype(f32) + eps) if affine else jnp.ones((c,), f32)
    b_t = bias.astype(f32) if affine else jnp.zeros((c,), f32)
    rstd = jax.lax.rsqrt(var.astype(f32) + eps)
    mean = mean.astype(f32)
    x2d = x.reshape(-1, c)
    if _use_pallas():
        z2d = _abn_fwd_spmd(x2d, mean, rstd * w_t, b_t,
                            activation, slope, x.dtype)
    else:
        y = (x2d - mean[None, :]) * (rstd * w_t)[None, :] + b_t[None, :]
        z2d = _act_fwd(y, activation, slope).astype(x.dtype)
    z = z2d.reshape(x.shape)
    return z, (w_t, b_t)


def _abn_vjp_fwd(x, weight, bias, mean, var, eps, activation, slope,
                 axis_name, training):
    z, (w_t, b_t) = _abn_fwd_impl(x, weight, bias, mean, var, eps, activation,
                                  slope)
    # THE memory trick: save z (the output), not x (functions.py:114).
    return z, (z, var, weight, bias, w_t, b_t)


def _abn_vjp_bwd(eps, activation, slope, axis_name, training, res, dz):
    z, var, weight, bias, w_t, b_t = res
    c = z.shape[-1]
    f32 = jnp.float32
    z2d = z.reshape(-1, c)
    dz2d = dz.reshape(-1, c)

    # Invert activation (XLA; fused into the reductions below).  The grad
    # sums edz/eydz accumulate in fp32 even for bf16/fp16 inputs — the
    # reference's half kernels promote to float for every reduction
    # (inplace_abn_cuda_half.cu:14-275).
    y2d, dy2d = _act_invert(z2d.astype(f32), dz2d.astype(f32), activation, slope)
    yhat = (y2d - b_t[None, :]) / w_t[None, :]

    if training:
        edz = jnp.sum(dy2d, axis=0)
        eydz = jnp.sum(yhat * dy2d, axis=0)
        count = z2d.shape[0]
        if axis_name is not None:
            edz = jax.lax.psum(edz, axis_name)
            eydz = jax.lax.psum(eydz, axis_name)
            count = count * jax.lax.psum(1, axis_name)
    else:
        edz = jnp.zeros((c,), f32)
        eydz = jnp.zeros((c,), f32)
        count = 1

    rstd = jax.lax.rsqrt(var.astype(f32) + eps)
    mul = w_t * rstd
    inv_count = (1.0 / count) if training else 0.0
    edzn = edz * inv_count
    eydzn = eydz * inv_count

    if _use_pallas():
        dx2d = _abn_bwd_spmd(z2d, dz2d, b_t, 1.0 / w_t, mul, edzn, eydzn,
                             activation, slope)
    else:
        dx2d = ((dy2d - edzn[None, :] - yhat * eydzn[None, :])
                * mul[None, :]).astype(z.dtype)

    dx = dx2d.reshape(z.shape)
    if weight is not None:
        # reference sign flip, functions.py:136-138
        dweight = (jnp.sign(weight) * eydz).astype(weight.dtype)
        dbias = edz.astype(bias.dtype)
    else:
        dweight, dbias = None, None
    return dx, dweight, dbias, None, None


inplace_abn.defvjp(_abn_vjp_fwd, _abn_vjp_bwd)


def batch_moments(x: jax.Array, axis_name: Optional[str] = None
                  ) -> Tuple[jax.Array, jax.Array]:
    """Per-channel (biased) mean/var over all non-channel dims, with the
    reference's cross-device moment merge (functions.py:167-184):
    ``var_all = Σ f·(var_i + (μ_i − μ_all)²)``."""
    c = x.shape[-1]
    x2d = x.reshape(-1, c).astype(jnp.float32)
    mean = jnp.mean(x2d, axis=0)
    var = jnp.mean(jnp.square(x2d), axis=0) - jnp.square(mean)
    if axis_name is not None:
        n_dev = jax.lax.psum(1, axis_name)
        mean_all = jax.lax.pmean(mean, axis_name)
        var = jax.lax.pmean(var + jnp.square(mean - mean_all), axis_name)
        mean = mean_all
    return mean, var
