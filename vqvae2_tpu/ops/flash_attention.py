"""Strictly-causal flash attention for the PixelSNAIL prior.

TPU-native replacement for the full-matrix causal attention of the reference
(``pixelsnail.py:182-234``): there, the ``(N, N)`` attention matrix is
materialized (masked scores, softmax, dropout, weighted sum).  At the bottom
hierarchy (N = 64·64 = 4096, batch 16, 8 heads) that matrix is 8 GB in fp32
and its gradient another 8 GB — the dominant HBM traffic (and a hard OOM for
the standalone layer) of the stage-2 train step.

This kernel streams K/V tiles through VMEM with the online-softmax recurrence
(Flash-Attention), so nothing of size ``(N, N)`` ever touches HBM:

* **Strict causality** — query ``i`` attends keys ``j < i`` only (the
  reference's ``tril(k=-1)`` mask), and row 0, which attends nothing, yields
  an exactly-zero output (the reference's ``start_mask``,
  ``pixelsnail.py:188-192,224-225``) — both fall out of one explicit tile
  mask applied to the un-normalized probabilities.
* **In-kernel dropout** on the attention probabilities (the reference's
  ``nn.Dropout(0.1)`` on ``attn``): a counter-based draw from the TPU core
  PRNG seeded per ``(batch·head, q-tile, k-tile)``, so the backward kernels
  regenerate bit-identical keep masks without storing them.
* **Flash backward** via ``jax.custom_vjp``: the forward saves only the
  per-row log-sum-exp ``L``; two backward kernels recompute probability
  tiles on the fly (dq over k-tiles; dk/dv over q-tiles).

Block-causal pruning skips the MXU work of fully-masked tiles
(``k-tile > q-tile``); with equal tile sizes that halves the compute.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _fmix32(h):
    """murmur3 finalizer — a bijection on uint32."""
    h = h ^ (h >> jnp.uint32(16))
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> jnp.uint32(13))
    h = h * jnp.uint32(0xC2B2AE35)
    return h ^ (h >> jnp.uint32(16))


def _tile_seed(seed, bh, qb, kb):
    """Deterministic per-tile PRNG seed.

    A chain of bijective mixes with XOR injections: two tiles of one launch
    collide only if their (bh, qb, kb) coordinates are equal (a linear
    combination of multiplied indices — the previous scheme — can alias
    distinct tile pairs mod 2³²)."""
    h = _fmix32(seed.astype(jnp.uint32) ^ jnp.uint32(0x9E3779B9))
    h = _fmix32(h ^ bh.astype(jnp.uint32))
    h = _fmix32(h ^ qb.astype(jnp.uint32))
    h = _fmix32(h ^ kb.astype(jnp.uint32))
    return h.astype(jnp.int32)


def _keep_mask(shape, rate: float):
    """Bernoulli(1-rate) keep mask from the seeded core PRNG."""
    bits = pltpu.prng_random_bits(shape)  # uint32
    threshold = jnp.uint32(min(int(rate * 2 ** 32), 2 ** 32 - 1))
    return (pltpu.bitcast(bits, jnp.uint32) >= threshold).astype(jnp.float32)


def _causal_tile_mask(qb, kb, tq: int, tk: int):
    """(tq, tk) strict-causal mask for the (qb, kb) tile pair: key j < query i."""
    qi = qb * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0)
    kj = kb * tk + jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
    return (kj < qi).astype(jnp.float32)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                acc_ref, m_ref, l_ref, *, sm_scale, dropout_rate, nk,
                precision):
    bh, qb, kb = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    tq, d = q_ref.shape[1], q_ref.shape[2]
    tk = k_ref.shape[1]

    @pl.when(kb == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    # Block-causal pruning: tiles strictly above the diagonal are all-masked.
    @pl.when(kb <= qb)
    def _compute():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision) * sm_scale
        mask = _causal_tile_mask(qb, kb, tq, tk)
        s = jnp.where(mask > 0, s, _NEG_INF)

        m_prev = m_ref[:]                                   # (tq, 1)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        # exp(_NEG_INF - m) underflows to 0 for any live row; fully-masked
        # rows (row 0 of the grid) keep m == _NEG_INF, and the explicit
        # `mask` factor zeroes their probabilities.
        p = jnp.exp(s - m_new) * mask                       # (tq, tk)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)

        if dropout_rate > 0.0:
            pltpu.prng_seed(_tile_seed(seed_ref[0], bh, qb, kb))
            p_drop = p * _keep_mask((tq, tk), dropout_rate) / (1.0 - dropout_rate)
        else:
            p_drop = p
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p_drop, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        m_ref[:] = m_new

    @pl.when(kb == nk - 1)
    def _finalize():
        l = l_ref[:]
        o_ref[0] = (acc_ref[:] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        # log-sum-exp per row for the backward recompute; fully-masked rows
        # keep lse == _NEG_INF (their p recomputes to 0 via the mask anyway).
        lse_ref[0] = m_ref[:] + jnp.log(jnp.maximum(l, 1e-30))


def _dq_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref,
               dq_ref, *, sm_scale, dropout_rate, nk, precision):
    bh, qb, kb = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    tq, d = q_ref.shape[1], q_ref.shape[2]
    tk = k_ref.shape[1]

    @pl.when(kb == 0)
    def _init():
        dq_ref[0] = jnp.zeros_like(dq_ref[0])

    @pl.when(kb <= qb)
    def _compute():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        do = do_ref[0].astype(jnp.float32)
        lse = lse_ref[0]                                    # (tq, 1)
        dsum = dsum_ref[0]                                  # (tq, 1)

        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision) * sm_scale
        mask = _causal_tile_mask(qb, kb, tq, tk)
        p = jnp.exp(jnp.where(mask > 0, s, _NEG_INF) - lse) * mask

        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision)                            # (tq, tk)
        if dropout_rate > 0.0:
            pltpu.prng_seed(_tile_seed(seed_ref[0], bh, qb, kb))
            dp = dp * _keep_mask((tq, tk), dropout_rate) / (1.0 - dropout_rate)
        ds = p * (dp - dsum) * sm_scale
        dq_ref[0] += jax.lax.dot_general(
            ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision).astype(dq_ref.dtype)


def _dkv_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref,
                dk_ref, dv_ref, *, sm_scale, dropout_rate, nq, precision):
    bh, kb, qb = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    tq = q_ref.shape[1]
    tk = k_ref.shape[1]

    @pl.when(qb == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    @pl.when(kb <= qb)
    def _compute():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        do = do_ref[0].astype(jnp.float32)
        lse = lse_ref[0]
        dsum = dsum_ref[0]

        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision) * sm_scale
        mask = _causal_tile_mask(qb, kb, tq, tk)
        p = jnp.exp(jnp.where(mask > 0, s, _NEG_INF) - lse) * mask

        if dropout_rate > 0.0:
            pltpu.prng_seed(_tile_seed(seed_ref[0], bh, qb, kb))
            keep = _keep_mask((tq, tk), dropout_rate) / (1.0 - dropout_rate)
            p_drop = p * keep
        else:
            keep = None
            p_drop = p
        dv_ref[0] += jax.lax.dot_general(
            p_drop, do, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision).astype(dv_ref.dtype)

        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        if keep is not None:
            dp = dp * keep
        ds = p * (dp - dsum) * sm_scale                     # (tq, tk)
        dk_ref[0] += jax.lax.dot_general(
            ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision).astype(dk_ref.dtype)


# Tile-size ceiling: the backward kernels hold ~4 (tq, tk) fp32 temporaries
# (s, mask, p, dp/ds) on the VMEM stack — a 1024 tile is 4 MB each and
# overflows the 16 MB scoped-vmem limit (observed: 16.72 M at N=1024, d=16).
# Forward and backward MUST tile identically when dropout is on (per-tile
# PRNG seeds regenerate the keep masks), so the cap applies to both.
_MAX_TILE = 512


def _pick_block(n: int, want: int) -> int:
    if n % 8:
        # halving `want` below can bottom out at a tile that does not divide
        # n, which would leave tail rows unwritten — refuse loudly instead.
        raise ValueError(
            f"causal flash attention requires the sequence length to be a "
            f"multiple of 8, got N={n}")
    b = min(want, n)
    while n % b:
        b //= 2
    return max(b, 8)


def _flash_fwd(q, k, v, seed, dropout_rate: float, block: int, precision,
               interpret: bool = False):
    bh, n, d = q.shape
    tq = tk = _pick_block(n, min(block, _MAX_TILE))
    nq, nk = n // tq, n // tk
    sm_scale = 1.0 / math.sqrt(d)
    kernel = functools.partial(_fwd_kernel, sm_scale=sm_scale,
                               dropout_rate=dropout_rate, nk=nk,
                               precision=precision)
    o, lse = pl.pallas_call(
        kernel,
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,) int32
            pl.BlockSpec((1, tq, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, tk, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, tk, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tq, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, tq, 1), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tq, d), jnp.float32),
            pltpu.VMEM((tq, 1), jnp.float32),
            pltpu.VMEM((tq, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * n * n * d * 2 // 2, transcendentals=bh * n * n // 2,
            bytes_accessed=4 * bh * n * d * 4,
        ),
        interpret=interpret,
    )(seed, q, k, v)
    return o, lse


def _flash_bwd(q, k, v, do, o, lse, seed, dropout_rate: float, block: int,
               precision, interpret: bool = False):
    bh, n, d = q.shape
    tq = tk = _pick_block(n, min(block, _MAX_TILE))
    nq, nk = n // tq, n // tk
    sm_scale = 1.0 / math.sqrt(d)
    dsum = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1,
                   keepdims=True)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, sm_scale=sm_scale,
                          dropout_rate=dropout_rate, nk=nk,
                          precision=precision),
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tq, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, tk, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, tk, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, tq, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, tq, 1), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, tq, 1), lambda b, i, j: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, tq, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), jnp.float32),
        interpret=interpret,
    )(seed, q, k, v, do, lse, dsum)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, sm_scale=sm_scale,
                          dropout_rate=dropout_rate, nq=nq,
                          precision=precision),
        grid=(bh, nk, nq),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tq, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, tk, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, tk, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, tq, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, tq, 1), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, tq, 1), lambda b, j, i: (b, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tk, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, tk, d), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, n, d), jnp.float32),
        ],
        interpret=interpret,
    )(seed, q, k, v, do, lse, dsum)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


# ---------------------------------------------------------------------------
# SPMD partitioning: a Pallas kernel is a custom call, which GSPMD cannot
# partition on its own — under a sharded mesh it would force replication
# (all-gathering the global batch onto every chip).  custom_partitioning
# declares the batch·head dim shardable; everything else is forced
# replicated (the causal structure spans the whole sequence, so sharding N
# would be wrong).  The per-shard lowering folds the shard's mesh position
# into the dropout seed, so batch shards draw independent keep masks; the
# forward and backward lowerings fold identically, keeping mask regeneration
# bit-consistent shard-by-shard.
# ---------------------------------------------------------------------------

def _batch_sharding(mesh, sharding, ndim):
    from jax.sharding import NamedSharding, PartitionSpec
    spec = getattr(sharding, "spec", PartitionSpec())
    b = spec[0] if len(spec) else None
    return NamedSharding(mesh, PartitionSpec(b, *([None] * (ndim - 1))))


def _replicated(mesh, ndim):
    from jax.sharding import NamedSharding, PartitionSpec
    return NamedSharding(mesh, PartitionSpec(*([None] * ndim)))


def _shard_seed_offset(b_axis):
    """Distinct int32 dropout-seed offset per batch shard (0 when the batch
    dim is unsharded).  Called inside a per-shard lowering, where
    ``axis_index`` resolves to this shard's position on the mesh axis."""
    if b_axis is None:
        return jnp.int32(0)
    names = b_axis if isinstance(b_axis, tuple) else (b_axis,)
    idx = jnp.int32(0)
    for nm in names:
        idx = idx * jax.lax.psum(1, nm) + jax.lax.axis_index(nm)
    return idx * jnp.int32(0x632BE5AB)  # odd -> injective mod 2^32


def _make_spmd(n_batch_args: int, n_results: int, n_static: int, fn,
               rule: str):
    """Wrap a (batch-leading arrays..., seed, *static) launcher so jit can
    shard the leading dim across the mesh and run the kernel per-shard."""
    from jax.experimental.custom_partitioning import custom_partitioning

    wrapped = custom_partitioning(
        fn, static_argnums=tuple(range(n_batch_args + 1,
                                       n_batch_args + 1 + n_static)))

    def infer(*top_args):
        mesh, arg_shapes = top_args[-3], top_args[-2]
        out = _batch_sharding(mesh, arg_shapes[0].sharding, 3)
        return (out,) * n_results if n_results > 1 else out

    def partition(*top_args):
        from jax.sharding import PartitionSpec

        mesh, arg_shapes, result_shape = top_args[-3:]
        static = top_args[:-3]
        b_shard = _batch_sharding(mesh, arg_shapes[0].sharding, 3)
        arg_shardings = tuple([b_shard] * n_batch_args + [_replicated(mesh, 1)])
        if n_results > 1:
            result_shardings = (b_shard,) * n_results
        else:
            result_shardings = b_shard

        spec0 = getattr(arg_shapes[0].sharding, "spec", PartitionSpec())
        b_axis = spec0[0] if len(spec0) else None

        def lower_fn(*args):
            args = list(args)
            # shard-distinct dropout streams (fwd and bwd fold identically,
            # so per-shard mask regeneration stays bit-consistent)
            args[n_batch_args] = args[n_batch_args] + _shard_seed_offset(b_axis)
            return fn(*args, *static)

        return mesh, lower_fn, result_shardings, arg_shardings

    wrapped.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=rule,
        decode_shardings=True,
    )
    return wrapped


_flash_fwd_spmd = _make_spmd(
    3, 2, 4, _flash_fwd, "b n d, b n d, b n d, s -> b n d, b n u")
_flash_bwd_spmd = _make_spmd(
    6, 3, 4, _flash_bwd,
    "b n d, b n d, b n d, b n d, b n d, b n u, s -> b n d, b n d, b n d")


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_attention_bhnd(q, k, v, seed, dropout_rate: float, block: int,
                          precision, interpret: bool = False):
    o, _ = _flash_fwd_spmd(q, k, v, seed, dropout_rate, block, precision,
                           interpret)
    return o


def _fa_fwd(q, k, v, seed, dropout_rate, block, precision, interpret):
    o, lse = _flash_fwd_spmd(q, k, v, seed, dropout_rate, block, precision,
                             interpret)
    return o, (q, k, v, o, lse, seed)


def _fa_bwd(dropout_rate, block, precision, interpret, res, g):
    q, k, v, o, lse, seed = res
    dq, dk, dv = _flash_bwd_spmd(q, k, v, g, o, lse, seed, dropout_rate, block,
                                 precision, interpret)
    return dq, dk, dv, None


_flash_attention_bhnd.defvjp(_fa_fwd, _fa_bwd)


def causal_flash_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, *,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    block: int = 1024,
    precision=None,
    interpret: bool = False,
) -> jax.Array:
    """Strictly-causal multi-head attention without the O(N²) HBM tensor.

    Args:
      q, k, v: ``(B, H, N, D)``.  Query ``i`` attends keys ``j < i`` — query
        0 attends nothing and returns exactly zero (the reference's
        ``start_mask`` semantics, ``pixelsnail.py:188-192``).
      dropout_rate: dropout on the attention probabilities (reference
        ``pixelsnail.py:205,226``); requires ``dropout_rng`` when > 0.
      dropout_rng: PRNG key folded into the in-kernel counter-based draw.
      block: q/k tile length (auto-shrunk to divide N, capped at 512 — the
        backward's (tq, tk) fp32 temporaries overflow the 16 MB scoped-VMEM
        stack at 1024, and fwd/bwd must tile identically for the per-tile
        dropout seeds to regenerate the same masks).

    Returns ``(B, H, N, D)`` in the dtype of ``q``.
    """
    b, h, n, d = q.shape
    if dropout_rate > 0.0:
        if dropout_rng is None:
            raise ValueError("dropout_rate > 0 requires dropout_rng")
        seed = jax.random.randint(dropout_rng, (1,), -2 ** 31, 2 ** 31 - 1,
                                  dtype=jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    out = _flash_attention_bhnd(
        q.reshape(b * h, n, d), k.reshape(b * h, n, d), v.reshape(b * h, n, d),
        seed, float(dropout_rate), block, precision, interpret)
    return out.reshape(b, h, n, d)


def causal_attention_reference(q, k, v, *, dropout_rate: float = 0.0,
                               dropout_rng: Optional[jax.Array] = None,
                               precision=None):
    """Full-matrix XLA fallback with identical semantics (CPU/GPU path and
    the ground truth for kernel parity tests)."""
    b, h, n, d = q.shape
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, precision=precision) / math.sqrt(d)
    qi = jnp.arange(n)[:, None]
    kj = jnp.arange(n)[None, :]
    mask = (kj < qi)
    s = jnp.where(mask[None, None], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    p = p * (qi > 0)[None, None].astype(p.dtype)  # row 0 attends nothing
    if dropout_rate > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, p.shape)
        p = p * keep / (1.0 - dropout_rate)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v,
                      precision=precision).astype(q.dtype)
