"""Fused nearest-codebook search for vector quantization.

TPU-native redesign of the reference ``Quantize.forward`` distance search
(reference ``vqvae.py:43-49``): there, the full ``(N, K)`` distance matrix
``‖x‖² − 2·x·E + ‖E‖²`` is materialized in HBM, argmaxed, and a separate
one-hot ``(N, K)`` matrix is built for both the embedding lookup and the EMA
statistics (``vqvae.py:50-60``).

Here one Pallas kernel streams tiles of ``x`` through VMEM and fuses, per tile:

1. the score matmul ``2·x@Eᵀ − ‖E‖²`` on the MXU (row-constant ``‖x‖²``
   dropped — it never changes the argmin),
2. the argmin (as argmax of the score) on the VPU,
3. the quantized output ``onehot @ E`` on the MXU (gather-free lookup), and
4. the EMA sufficient statistics ``Σ onehot`` (cluster counts, K) and
   ``onehotᵀ @ x`` (per-code sums, (K, D)), accumulated across grid steps in
   VMEM — TPU grids run sequentially, so accumulation into a
   constant-index output block is race-free.

Nothing of size ``(N, K)`` ever touches HBM.  Under GSPMD the launchers carry
a ``custom_partitioning`` rule (rows shard across the mesh; the EMA stats are
psum'd inside the per-shard lowering — the reference's ``dist_fn.all_reduce``,
``vqvae.py:58-59``); under shard_map the model layer psums them instead.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _vmem_block_cap(d: int, k: int, block_n: int = 2048) -> int:
    """Largest power-of-two row tile that keeps the kernel's scoped-VMEM
    footprint under budget.

    The default 2048-row tile was sized for the flagship ``d=64`` codebook;
    at the deep config (``d=256``) it overflows the 16 MB scoped-VMEM stack
    (observed: 19.14 MB at block 2048, d=256, k=512 — the stats flavor holds
    the double-buffered x/q row blocks, the (TN, K) score and one-hot tiles,
    and the 3-chunk bf16 splits of x for the exact esum matmul).  Model those
    per-row bytes against a 12 MB budget (headroom for layout padding) and
    halve the tile until it fits; d=64 keeps the full 2048 tile.
    """
    per_row = 8 * d + 8 * d + 4 * k + 2 * k + 6 * d + 32
    fixed = 14 * k * d + 8 * k
    budget = 12 * 2 ** 20 - fixed
    while block_n > 8 and block_n * per_row > budget:
        block_n //= 2
    return max(block_n, 8)


# ---------------------------------------------------------------------------
# XLA reference path (also the CPU/GPU fallback and the ground truth in tests)
# ---------------------------------------------------------------------------

def nearest_code_reference(
    flat: jax.Array, embed: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Pure-XLA nearest-code search.

    Args:
      flat:  ``(N, D)`` inputs.
      embed: ``(K, D)`` codebook.

    Returns ``(indices (N,), quantized (N, D), cluster_sum (K,), embed_sum (K, D))``
    — exactly the quantities the reference builds at ``vqvae.py:43-57``.
    """
    flat32 = flat.astype(jnp.float32)
    embed32 = embed.astype(jnp.float32)
    # score = −(‖x‖² − 2·x·Eᵀ + ‖E‖²) — the exact expanded form the reference
    # argmaxes (vqvae.py:44-49), kept term-for-term for index parity.
    # HIGHEST matmul precision: the TPU MXU's default reduced-precision fp32
    # pass perturbs near-tie distances enough to flip code indices.
    score = (
        2.0 * jnp.matmul(flat32, embed32.T, precision=jax.lax.Precision.HIGHEST)
        - jnp.sum(flat32 * flat32, axis=1)[:, None]
        - jnp.sum(embed32 * embed32, axis=1)[None, :]
    )
    indices = jnp.argmax(score, axis=1).astype(jnp.int32)
    onehot = jax.nn.one_hot(indices, embed.shape[0], dtype=jnp.float32)
    # HIGHEST keeps these two products exact on TPU: the MXU's fast
    # single-pass default would round the looked-up codebook rows / EMA stat
    # sums to bf16 precision (the Pallas kernel uses a cheaper 3-chunk split
    # with the same exactness guarantee).
    quantized = jnp.matmul(
        onehot, embed32, precision=jax.lax.Precision.HIGHEST
    ).astype(flat.dtype)
    cluster_sum = jnp.sum(onehot, axis=0)
    embed_sum = jnp.matmul(onehot.T, flat32,
                           precision=jax.lax.Precision.HIGHEST)
    return indices, quantized, cluster_sum, embed_sum


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------

def _split3(m: jax.Array):
    """Split an fp32 array into 3 bf16-exact chunks with ``m == m1+m2+m3``
    exactly (fp32 has 24 mantissa bits = 3×8 bf16 chunks)."""
    m1 = m.astype(jnp.bfloat16)
    r = m - m1.astype(jnp.float32)
    m2 = r.astype(jnp.bfloat16)
    m3 = (r - m2.astype(jnp.float32)).astype(jnp.bfloat16)
    return m1, m2, m3


def _exact_onehot_dot(onehot_b: jax.Array, m: jax.Array,
                      dims=(((1,), (0,)), ((), ()))) -> jax.Array:
    """Exact fp32 ``onehot @ m`` in 3 single-pass MXU matmuls.

    The MXU's fast fp32 default rounds operands to bf16 (one pass), so a plain
    dot returns bf16-rounded codebook rows / stat sums; HIGHEST is exact but
    costs 6 passes.  Since one-hot values (0/1) are bf16-exact, splitting only
    ``m`` into 3 bf16-exact chunks and summing the three exact products in
    fp32 reconstructs the exact fp32 result in half the passes."""
    parts = [
        jax.lax.dot_general(onehot_b, c, dimension_numbers=dims,
                            preferred_element_type=jnp.float32)
        for c in _split3(m)
    ]
    return (parts[0] + parts[1]) + parts[2]


def _quantize_kernel_nostats(x_ref, embed_ref, idx_ref, q_ref):
    """Eval/extract flavor: distances + argmin + lookup only (no EMA stats —
    the encode path of extract_code.py / inference never consumes them)."""
    x = x_ref[:].astype(jnp.float32)
    embed = embed_ref[:].astype(jnp.float32)
    score = 2.0 * jax.lax.dot_general(
        x, embed, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    score = (score - jnp.sum(x * x, axis=1)[:, None]
             - jnp.sum(embed * embed, axis=1)[None, :])
    best = jnp.argmax(score, axis=1).astype(jnp.int32)
    idx_ref[:] = best[:, None]
    onehot_b = (
        best[:, None] == jax.lax.broadcasted_iota(jnp.int32,
                                                  (x.shape[0], embed.shape[0]), 1)
    ).astype(jnp.bfloat16)
    q_ref[:] = _exact_onehot_dot(onehot_b, embed).astype(q_ref.dtype)


def _quantize_kernel_ids(x_ref, embed_ref, idx_ref):
    """Code-extraction flavor: indices only.  A custom call's outputs cannot
    be dead-code-eliminated by XLA, so when the caller consumes only the ids
    (extract_codes, the headline bench) this skips the 3-pass exact lookup
    matmul entirely (~1/3 of kernel MXU passes)."""
    x = x_ref[:].astype(jnp.float32)
    embed = embed_ref[:].astype(jnp.float32)
    score = 2.0 * jax.lax.dot_general(
        x, embed, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    score = (score - jnp.sum(x * x, axis=1)[:, None]
             - jnp.sum(embed * embed, axis=1)[None, :])
    idx_ref[:] = jnp.argmax(score, axis=1).astype(jnp.int32)[:, None]


def _quantize_kernel(x_ref, embed_ref, idx_ref, q_ref, csum_ref, esum_ref):
    step = pl.program_id(0)

    x = x_ref[:].astype(jnp.float32)            # (TN, D)
    embed = embed_ref[:].astype(jnp.float32)    # (K, D)

    # MXU: (TN, D) @ (D, K) -> (TN, K).  HIGHEST precision — index parity
    # requires true-fp32 distances, not the MXU's fast fp32 approximation.
    score = 2.0 * jax.lax.dot_general(
        x, embed,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    # Exact expanded L2 form of the reference (vqvae.py:44-49), incl. the
    # per-row ‖x‖² term so index choice matches the XLA path bit-for-bit.
    score = (
        score
        - jnp.sum(x * x, axis=1)[:, None]
        - jnp.sum(embed * embed, axis=1)[None, :]
    )

    best = jnp.argmax(score, axis=1).astype(jnp.int32)          # (TN,)
    idx_ref[:] = best[:, None]

    k = embed.shape[0]
    onehot_b = (
        best[:, None] == jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], k), 1)
    ).astype(jnp.bfloat16)                                       # (TN, K)

    # Gather-free codebook lookup on the MXU, exact via the 3-chunk split
    # (see _exact_onehot_dot — a plain fast-fp32 dot would hand back
    # bf16-rounded codebook rows and bf16-rounded EMA stat sums).
    q_ref[:] = _exact_onehot_dot(onehot_b, embed).astype(q_ref.dtype)

    # EMA sufficient statistics, accumulated across sequential grid steps.
    @pl.when(step == 0)
    def _init():
        csum_ref[:] = jnp.zeros_like(csum_ref)
        esum_ref[:] = jnp.zeros_like(esum_ref)

    csum_ref[:] += jnp.sum(onehot_b.astype(jnp.float32), axis=0)[None, :]
    esum_ref[:] += _exact_onehot_dot(
        onehot_b, x, dims=(((0,), (0,)), ((), ())))


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def _nearest_code_pallas_nostats(flat: jax.Array, embed: jax.Array,
                                 block_n: int = 2048,
                                 interpret: bool = False):
    n, d = flat.shape
    k = embed.shape[0]
    n_pad = _round_up(max(n, 8), block_n)
    if n_pad != n:
        flat = jnp.pad(flat, ((0, n_pad - n), (0, 0)))
    grid = (n_pad // block_n,)
    idx, q = pl.pallas_call(
        _quantize_kernel_nostats,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_n, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, d), flat.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * k * d * 2,
            bytes_accessed=(n_pad * d + k * d) * 4 + n_pad * (4 + d * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(flat, embed)
    return idx[:n, 0], q[:n]


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def _nearest_code_pallas_ids(flat: jax.Array, embed: jax.Array,
                             block_n: int = 2048, interpret: bool = False):
    n, d = flat.shape
    k = embed.shape[0]
    n_pad = _round_up(max(n, 8), block_n)
    if n_pad != n:
        flat = jnp.pad(flat, ((0, n_pad - n), (0, 0)))
    grid = (n_pad // block_n,)
    idx = pl.pallas_call(
        _quantize_kernel_ids,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * k * d,
            bytes_accessed=(n_pad * d + k * d) * 4 + n_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(flat, embed)
    return idx[:n, 0]


def nearest_code_ids(flat: jax.Array, embed: jax.Array,
                     block_n: int = 2048) -> jax.Array:
    """Indices-only nearest-code search (same argmin as :func:`nearest_code`;
    skips quantized-vector and stat outputs for the extract/bench path)."""
    if flat.ndim != 2 or embed.ndim != 2 or flat.shape[1] != embed.shape[1]:
        raise ValueError(f"bad shapes {flat.shape} vs {embed.shape}")
    if jax.default_backend() == "tpu":
        n = flat.shape[0]
        block_n = _vmem_block_cap(flat.shape[1], embed.shape[0], block_n)
        eff_block = block_n if n >= block_n else _round_up(max(n, 8), 8)
        return jax.lax.stop_gradient(
            _nearest_code_pallas_ids_spmd(flat, embed, eff_block, False))
    return nearest_code_reference(flat, embed)[0]


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def _nearest_code_pallas(flat: jax.Array, embed: jax.Array, block_n: int = 2048,
                         interpret: bool = False):
    n, d = flat.shape
    k = embed.shape[0]

    n_pad = _round_up(max(n, 8), block_n)
    if n_pad != n:
        # Padding rows quantize to *some* code; their stats are subtracted
        # exactly below (every pad row maps to the same argmax of the constant
        # zero-input score, i.e. the code with min ‖E‖²).
        flat = jnp.pad(flat, ((0, n_pad - n), (0, 0)))

    grid = (n_pad // block_n,)
    idx, q, csum, esum = pl.pallas_call(
        _quantize_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_n, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, d), flat.dtype),
            jax.ShapeDtypeStruct((1, k), jnp.float32),
            jax.ShapeDtypeStruct((k, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * k * d * 2,
            bytes_accessed=(n_pad * d + k * d) * 4 + n_pad * (4 + d * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(flat, embed)

    if n_pad != n:
        # Remove the padding rows' contribution to the stats.
        pad_idx = idx[n:n_pad, 0]
        pad_onehot = jax.nn.one_hot(pad_idx, k, dtype=jnp.float32)
        csum = csum - jnp.sum(pad_onehot, axis=0)[None, :]
        # pad rows are zero vectors -> contribute nothing to esum.
        idx = idx[:n]
        q = q[:n]

    return idx[:, 0], q, csum[0], esum


# ---------------------------------------------------------------------------
# SPMD partitioning: the Pallas launchers are custom calls, opaque to GSPMD —
# without a partitioning rule a data-parallel mesh would all-gather the full
# global row set onto every chip.  Rows (dim 0 of ``flat``) are embarrassingly
# parallel for the search/lookup outputs; the EMA sufficient statistics are
# row reductions, so the per-shard partials are psum'd inside the per-shard
# lowering (the moral equivalent of the reference's ``dist_fn.all_reduce``,
# ``vqvae.py:58-59``).  The codebook is forced replicated (512×64 — an
# all-gather of it is nothing next to sharding the rows).
# ---------------------------------------------------------------------------

def _spmd_rows(fn, rule: str, n_stats: int):
    """Wrap launcher ``fn(flat, embed, block_n)`` for GSPMD: shard rows,
    replicate embed; psum the trailing ``n_stats`` outputs across the row
    shards."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    wrapped = custom_partitioning(fn, static_argnums=(2, 3))

    def _row_axis(sharding):
        spec = getattr(sharding, "spec", PartitionSpec())
        return spec[0] if len(spec) else None

    def _shardings(mesh, axis, result_shape):
        row = lambda nd: NamedSharding(
            mesh, PartitionSpec(axis, *([None] * (nd - 1))))
        rep = lambda nd: NamedSharding(mesh, PartitionSpec(*([None] * nd)))
        results = jax.tree.leaves(result_shape)
        out = []
        for i, r in enumerate(results):
            sharded = i < len(results) - n_stats
            out.append(row(r.ndim) if sharded else rep(r.ndim))
        return tuple(out) if len(out) > 1 else out[0]

    def infer(block_n, interpret, mesh, arg_shapes, result_shape):
        return _shardings(mesh, _row_axis(arg_shapes[0].sharding),
                          result_shape)

    def partition(block_n, interpret, mesh, arg_shapes, result_shape):
        axis = _row_axis(arg_shapes[0].sharding)
        arg_shardings = (
            NamedSharding(mesh, PartitionSpec(axis, None)),
            NamedSharding(mesh, PartitionSpec(None, None)),
        )
        result_shardings = _shardings(mesh, axis, result_shape)

        def lower_fn(flat, embed):
            out = fn(flat, embed, block_n, interpret)
            if n_stats and axis is not None:
                out = (*out[:-n_stats],
                       *(jax.lax.psum(s, axis) for s in out[-n_stats:]))
            return out

        return mesh, lower_fn, result_shardings, arg_shardings

    wrapped.def_partition(partition=partition,
                          infer_sharding_from_operands=infer,
                          sharding_rule=rule, decode_shardings=True)
    return wrapped


_nearest_code_pallas_spmd = _spmd_rows(
    lambda flat, embed, block_n, interpret=False: _nearest_code_pallas(
        flat, embed, block_n, interpret),
    "n d, k d -> n, n d, k, k d", n_stats=2)
_nearest_code_pallas_nostats_spmd = _spmd_rows(
    lambda flat, embed, block_n, interpret=False: _nearest_code_pallas_nostats(
        flat, embed, block_n, interpret),
    "n d, k d -> n, n d", n_stats=0)
_nearest_code_pallas_ids_spmd = _spmd_rows(
    lambda flat, embed, block_n, interpret=False: _nearest_code_pallas_ids(
        flat, embed, block_n, interpret),
    "n d, k d -> n", n_stats=0)


# The kernel is not differentiable (and must not be traced by JVP — argmin
# and EMA stats are piecewise-constant).  Gradients are defined as zero at the
# op boundary; callers implement the straight-through estimator explicitly
# (models/vqvae.py Quantize.__call__), exactly like the reference detaches
# around the quantizer (vqvae.py:72-73).
@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _nearest_code_pallas_nograd(flat, embed, block_n: int = 2048):
    return _nearest_code_pallas_spmd(flat, embed, block_n, False)


def _ncp_fwd(flat, embed, block_n):
    return _nearest_code_pallas_spmd(flat, embed, block_n, False), (flat, embed)


def _ncp_bwd(block_n, res, g):
    flat, embed = res
    return jnp.zeros_like(flat), jnp.zeros_like(embed)


_nearest_code_pallas_nograd.defvjp(_ncp_fwd, _ncp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _nearest_code_pallas_nostats_nograd(flat, embed, block_n: int = 2048):
    return _nearest_code_pallas_nostats_spmd(flat, embed, block_n, False)


def _ncpn_fwd(flat, embed, block_n):
    return _nearest_code_pallas_nostats_spmd(flat, embed, block_n, False), (flat, embed)


def _ncpn_bwd(block_n, res, g):
    flat, embed = res
    return jnp.zeros_like(flat), jnp.zeros_like(embed)


_nearest_code_pallas_nostats_nograd.defvjp(_ncpn_fwd, _ncpn_bwd)


def nearest_code(
    flat: jax.Array, embed: jax.Array, block_n: int = 2048,
    with_stats: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Fused nearest-code search; Pallas on TPU, XLA elsewhere.

    Same contract as :func:`nearest_code_reference`.  Non-differentiable
    (zero vjp) — wrap with an explicit straight-through estimator.
    ``with_stats=False`` skips the EMA sufficient-statistics matmuls (the
    eval/extract path never consumes them) and returns zeros in their place.
    """
    if flat.ndim != 2 or embed.ndim != 2 or flat.shape[1] != embed.shape[1]:
        raise ValueError(f"bad shapes {flat.shape} vs {embed.shape}")
    if jax.default_backend() == "tpu":
        # adapt the row tile to the input so small feature maps don't pay a
        # 2048-row pad (e.g. a 16x16 top grid at batch 2 is 512 rows), and
        # cap it so wide codebooks (deep config d=256) fit in scoped VMEM
        n = flat.shape[0]
        block_n = _vmem_block_cap(flat.shape[1], embed.shape[0], block_n)
        eff_block = block_n if n >= block_n else _round_up(max(n, 8), 8)
        if with_stats:
            return _nearest_code_pallas_nograd(flat, embed, eff_block)
        idx, q = _nearest_code_pallas_nostats_nograd(flat, embed, eff_block)
        k = embed.shape[0]
        return (idx, q, jnp.zeros((k,), jnp.float32),
                jnp.zeros((k, flat.shape[1]), jnp.float32))
    return nearest_code_reference(flat, embed)


def quantize_lookup(indices: jax.Array, embed: jax.Array) -> jax.Array:
    """``embed_code`` equivalent (reference ``vqvae.py:77-78``): codebook
    lookup by integer index, any leading shape."""
    return jnp.take(embed, indices, axis=0)
