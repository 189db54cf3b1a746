"""Incremental (cached-decode) PixelSNAIL sampling.

The straightforward compiled sampler (:mod:`vqvae2_tpu.models.sampling`)
re-forwards the FULL grid every step — O(HW) full forwards, just like the
reference's host loop (``sample.py:12-24``) but on-device.  This module is
the cached decoder the BASELINE asks for: per step it computes activations
at ONE position only, reading per-layer activation caches.

Mechanics
---------
* All weight-normalized kernels are resolved ONCE into plain (w, b) pairs
  (causal masks folded in) — no per-step normalization.
* Every intermediate stream (block inputs, causal-conv intermediates, res
  outputs) is cached as a zero-padded (B, H+PT, W+PL+PR, C) grid; activations
  at raster position t are pure functions of cache entries at positions < t,
  so one pass per step fills position t everywhere and then samples code t.
* Causal convs become small window dot products (einsum over a (kh, kw)
  window); attention keeps per-block K/V caches and does one masked
  softmax-attend over the prefix.
* Per-step FLOPs drop by ~H·W (≈1000× for the 32×32 top prior); the loop is
  a single ``lax.fori_loop`` program.

Exactness: teacher-forced incremental logits equal the full forward's logits
(tests/test_incremental.py) — same parameters, same math, different schedule.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vqvae2_tpu.models.pixelsnail import PixelSNAIL, _background

PT = 4   # top padding rows (max causal kernel height - 1)
PL = 4   # left padding cols
PR = 4   # right padding cols


# ---------------------------------------------------------------------------
# Resolve weight-normalized params into plain kernels
# ---------------------------------------------------------------------------

def _wn_conv(p: Dict[str, jax.Array], mask: Optional[np.ndarray] = None):
    v, g = p["v"], p["g"]
    if mask is not None:
        v = v * jnp.asarray(mask, v.dtype)[:, :, None, None]
    norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1, 2), keepdims=True) + 1e-12)
    w = (g[None, None, None, :] / norm) * v
    return w, p.get("b")


def _wn_dense(p: Dict[str, jax.Array]):
    v, g = p["v"], p["g"]
    norm = jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True) + 1e-12)
    return (g[None, :] / norm) * v, p.get("b")


def _causal_mask(k: int) -> np.ndarray:
    m = np.ones((k, k), np.float32)
    m[-1, k // 2:] = 0.0
    return m


def resolve_params(model: PixelSNAIL, variables) -> Dict[str, Any]:
    """Flatten the PixelSNAIL variables into plain kernels (weight norm and
    causal masks applied once)."""
    p = variables["params"]
    k = model.kernel_size
    out: Dict[str, Any] = {
        "horizontal": _wn_conv(p["horizontal"]["WNConv_0"]),
        "vertical": _wn_conv(p["vertical"]["WNConv_0"]),
        "blocks": [],
        "out_res": [],
        "out_conv": _wn_conv(p["out_conv"]),
    }
    cm = _causal_mask(k)
    for b in range(model.n_block):
        bp = p[f"blocks_{b}"]
        blk: Dict[str, Any] = {"res": []}
        for r in range(model.n_res_block):
            rp = bp[f"res{r}"]
            entry = {
                "conv1": _wn_conv(rp["conv1"]["WNConv_0"], cm),
                "conv2": _wn_conv(rp["conv2"]["WNConv_0"], cm),
            }
            if "condition" in rp:
                entry["condition"] = _wn_conv(rp["condition"])
            blk["res"].append(entry)
        if model.attention:
            blk["key_rb"] = {n: _wn_conv(bp["key_resblock"][n])
                             for n in ("conv1", "conv2")}
            blk["query_rb"] = {n: _wn_conv(bp["query_resblock"][n])
                               for n in ("conv1", "conv2")}
            blk["attn"] = {n: _wn_dense(bp["causal_attention"][n])
                           for n in ("query", "key", "value")}
            blk["out_rb"] = {n: _wn_conv(bp["out_resblock"][n])
                             for n in ("conv1", "conv2", "aux_conv")}
        else:
            blk["out"] = _wn_conv(bp["out"])
        out["blocks"].append(blk)
    for i in range(model.n_out_res_block):
        rp = p[f"out_res_{i}"]
        out["out_res"].append({n: _wn_conv(rp[n]) for n in ("conv1", "conv2")})
    return out


# ---------------------------------------------------------------------------
# Per-position primitives
# ---------------------------------------------------------------------------

def _window_dot(cache: jax.Array, i, j, wb, row_off: int, col_off: int,
                pre_elu: bool) -> jax.Array:
    """Dot a (kh, kw) window of ``cache`` ending at padded position derived
    from (i, j) with kernel w.  ``row_off``/``col_off`` encode the shift
    semantics (0-centered cols, -1 offsets for the shift_down/right streams)."""
    w, b = wb
    kh, kw, cin, cout = w.shape
    rs = i + PT - (kh - 1) + row_off
    cs = j + PL + col_off
    win = jax.lax.dynamic_slice(
        cache, (0, rs, cs, 0), (cache.shape[0], kh, kw, cin))
    if pre_elu:
        win = jax.nn.elu(win)
    y = jnp.einsum("bhwc,hwco->bo", win, w)
    return y + b if b is not None else y


def _pix(wb, x: jax.Array, pre_elu: bool = False) -> jax.Array:
    """1×1 conv applied to a single position vector (B, C)."""
    w, b = wb
    if pre_elu:
        x = jax.nn.elu(x)
    y = x @ w[0, 0]
    return y + b if b is not None else y


def _gated_res_pix(rb, x: jax.Array, aux: Optional[jax.Array] = None
                   ) -> jax.Array:
    """GatedResBlock with kernel 1 at one position (B, C)."""
    h = _pix(rb["conv1"], x, pre_elu=True)
    if aux is not None:
        h = h + _pix(rb["aux_conv"], aux, pre_elu=True)
    h = jax.nn.elu(h)
    h = _pix(rb["conv2"], h)
    a, g = jnp.split(h, 2, axis=-1)
    return x + a * jax.nn.sigmoid(g)


def _write(cache: jax.Array, i, j, val: jax.Array) -> jax.Array:
    return jax.lax.dynamic_update_slice(
        cache, val[:, None, None, :], (0, i + PT, j + PL, 0))


# ---------------------------------------------------------------------------
# The incremental step
# ---------------------------------------------------------------------------

def _make_caches(model: PixelSNAIL, batch: int, dtype=jnp.float32):
    h, w = model.shape
    shp = lambda c: jnp.zeros((batch, h + PT, w + PL + PR, c), dtype)
    caches: Dict[str, jax.Array] = {"x": shp(model.n_class)}
    caches["s0"] = shp(model.channel)
    for b in range(model.n_block):
        for r in range(model.n_res_block):
            caches[f"h{b}_{r}"] = shp(model.res_channel)   # conv1 outputs
            caches[f"t{b}_{r}"] = shp(model.channel)       # res outputs
        caches[f"s{b+1}"] = shp(model.channel)             # block outputs
        if model.attention:
            n_head = 8
            dim_head = (model.channel // 2) // n_head
            caches[f"K{b}"] = jnp.zeros((batch, n_head, h * w, dim_head), dtype)
            caches[f"V{b}"] = jnp.zeros((batch, n_head, h * w, dim_head), dtype)
    return caches


def _step_logits(model: PixelSNAIL, pp, caches, i, j, t,
                 cond_grid: Optional[jax.Array]):
    """Compute logits at raster position t=(i,j) and write all layer
    activations at t into the caches.  Returns (logits, caches)."""
    h_grid, w_grid = model.shape
    batch = caches["x"].shape[0]
    kernel = model.kernel_size + (model.kernel_size % 2 == 0)

    # input streams (shift_down(horizontal) + shift_right(vertical))
    horiz = _window_dot(caches["x"], i, j, pp["horizontal"], row_off=-1,
                        col_off=-(kernel // 2), pre_elu=False)
    vert = _window_dot(caches["x"], i, j, pp["vertical"], row_off=0,
                       col_off=-(kernel // 2 - 1) - 1, pre_elu=False)
    s = horiz + vert
    caches["s0"] = _write(caches["s0"], i, j, s)

    bg_i = (i - h_grid / 2) / h_grid
    bg_j = (j - w_grid / 2) / w_grid
    background = jnp.stack([
        jnp.full((batch,), bg_i, s.dtype), jnp.full((batch,), bg_j, s.dtype)
    ], axis=-1)

    cond = None
    if cond_grid is not None:
        cond = jax.lax.dynamic_slice(
            cond_grid, (0, i, j, 0),
            (batch, 1, 1, cond_grid.shape[-1]))[:, 0, 0]

    k2 = model.kernel_size // 2
    for b in range(model.n_block):
        block_in = s
        out = s
        for r in range(model.n_res_block):
            in_cache = caches["s" + str(b)] if r == 0 else caches[f"t{b}_{r-1}"]
            h1 = _window_dot(in_cache, i, j, pp["blocks"][b]["res"][r]["conv1"],
                             row_off=0, col_off=-k2, pre_elu=True)
            caches[f"h{b}_{r}"] = _write(caches[f"h{b}_{r}"], i, j, h1)
            h2 = _window_dot(caches[f"h{b}_{r}"], i, j,
                             pp["blocks"][b]["res"][r]["conv2"],
                             row_off=0, col_off=-k2, pre_elu=True)
            if cond is not None:
                h2 = h2 + _pix(pp["blocks"][b]["res"][r]["condition"], cond)
            a, g = jnp.split(h2, 2, axis=-1)
            out = out + a * jax.nn.sigmoid(g)
            caches[f"t{b}_{r}"] = _write(caches[f"t{b}_{r}"], i, j, out)

        if model.attention:
            blk = pp["blocks"][b]
            n_head = 8
            dim_attn = model.channel // 2
            dim_head = dim_attn // n_head

            key_in = jnp.concatenate([block_in, out, background], axis=-1)
            key_feat = _gated_res_pix(blk["key_rb"], key_in)
            query_in = jnp.concatenate([out, background], axis=-1)
            query_feat = _gated_res_pix(blk["query_rb"], query_in)

            wq, bq = blk["attn"]["query"]
            wk, bk = blk["attn"]["key"]
            wv, bv = blk["attn"]["value"]
            q = (query_feat @ wq + bq).reshape(batch, n_head, dim_head)
            k_t = (key_feat @ wk + bk).reshape(batch, n_head, dim_head)
            v_t = (key_feat @ wv + bv).reshape(batch, n_head, dim_head)

            # attend over the strict prefix (positions < t)
            scores = jnp.einsum("bnd,bnld->bnl", q, caches[f"K{b}"])
            scores = scores / math.sqrt(dim_head)
            pos = jnp.arange(caches[f"K{b}"].shape[2])
            scores = jnp.where(pos[None, None, :] < t, scores, -1e4)
            attn = jax.nn.softmax(scores, axis=-1)
            attn_out = jnp.einsum("bnl,bnld->bnd", attn, caches[f"V{b}"])
            attn_out = attn_out.reshape(batch, dim_attn)
            attn_out = attn_out * (t > 0)  # start_mask semantics

            # store this position's K/V for future queries
            caches[f"K{b}"] = jax.lax.dynamic_update_slice(
                caches[f"K{b}"], k_t[:, :, None, :], (0, 0, t, 0))
            caches[f"V{b}"] = jax.lax.dynamic_update_slice(
                caches[f"V{b}"], v_t[:, :, None, :], (0, 0, t, 0))

            out = _gated_res_pix(blk["out_rb"], out, aux=attn_out)
        else:
            bg_cat = jnp.concatenate([out, background], axis=-1)
            out = _pix(pp["blocks"][b]["out"], bg_cat)

        caches[f"s{b+1}"] = _write(caches[f"s{b+1}"], i, j, out)
        s = out

    for rb in pp["out_res"]:
        s = _gated_res_pix(rb, s)
    logits = _pix(pp["out_conv"], jax.nn.elu(s))
    return logits, caches


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("model", "batch", "temperature"))
def sample_prior_incremental(
    model: PixelSNAIL,
    variables,
    rng: jax.Array,
    batch: int,
    temperature: float = 1.0,
    condition: Optional[jax.Array] = None,
) -> jax.Array:
    """Cached-decode sampling: same distribution as
    :func:`vqvae2_tpu.models.sampling.sample_prior` (given the same per-step
    categorical draws), ~HW× fewer FLOPs per step."""
    h, w = model.shape
    pp = resolve_params(model, variables)

    cond_grid = None
    if condition is not None:
        cond_grid = model.apply({"params": variables["params"]}, condition,
                                method=model.compute_condition)

    caches = _make_caches(model, batch, jnp.float32)
    codes0 = jnp.zeros((batch, h, w), jnp.int32)

    def body(t, carry):
        codes, caches, rng = carry
        i, j = t // w, t % w
        logits, caches = _step_logits(model, pp, caches, i, j, t, cond_grid)
        rng, sub = jax.random.split(rng)
        draw = jax.random.categorical(sub, logits / temperature, axis=-1)
        codes = codes.reshape(batch, h * w).at[:, t].set(
            draw.astype(jnp.int32)).reshape(batch, h, w)
        onehot = jax.nn.one_hot(draw, model.n_class, dtype=caches["x"].dtype)
        caches["x"] = _write(caches["x"], i, j, onehot)
        return codes, caches, rng

    codes, _, _ = jax.lax.fori_loop(0, h * w, body, (codes0, caches, rng))
    return codes


def teacher_forced_logits(model: PixelSNAIL, variables, codes: jax.Array,
                          condition: Optional[jax.Array] = None) -> jax.Array:
    """Run the incremental decoder with the given codes written in (no
    sampling) and return logits at every position — the equivalence probe
    against the full forward."""
    h, w = model.shape
    batch = codes.shape[0]
    pp = resolve_params(model, variables)
    cond_grid = None
    if condition is not None:
        cond_grid = model.apply({"params": variables["params"]}, condition,
                                method=model.compute_condition)
    caches = _make_caches(model, batch, jnp.float32)
    logits0 = jnp.zeros((batch, h * w, model.n_class), jnp.float32)
    flat_codes = codes.reshape(batch, h * w)

    def body(t, carry):
        logits_all, caches = carry
        i, j = t // w, t % w
        logits, caches = _step_logits(model, pp, caches, i, j, t, cond_grid)
        logits_all = jax.lax.dynamic_update_slice(
            logits_all, logits[:, None, :], (0, t, 0))
        onehot = jax.nn.one_hot(flat_codes[:, t], model.n_class,
                                dtype=caches["x"].dtype)
        caches["x"] = _write(caches["x"], i, j, onehot)
        return logits_all, caches

    logits_all, _ = jax.lax.fori_loop(0, h * w, body, (logits0, caches))
    return logits_all.reshape(batch, h, w, model.n_class)
