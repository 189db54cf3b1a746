"""Import reference PyTorch checkpoints into vqvae2_tpu models.

A user of the reference switching to this framework brings torch
``state_dict`` files (e.g. the published ``vqvae_560.pt``,
reference README.md:16).  This module converts them so code indices and
reconstructions reproduce (BASELINE.json: "bit-exact code indices vs
reference checkpoint").

Weight layout mappings (pinned numerically against torch in
tests/test_torch_import.py):

* Conv2d          (O, I, kH, kW)  → flax (kH, kW, I, O)
* ConvTranspose2d (I, O, kH, kW)  → flax (kH, kW, I, O) **spatially flipped**
  (torch's transposed conv correlates with the flipped kernel relative to
  flax's ``ConvTranspose``)
* Quantize buffers: reference stores ``embed`` as (dim, n_embed)
  (vqvae.py:37) → ours is (n_embed, dim); ``embed_avg`` likewise;
  ``cluster_size`` is shared as-is.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax.numpy as jnp
import numpy as np


def conv_kernel(w: np.ndarray) -> jnp.ndarray:
    """torch Conv2d weight → flax Conv kernel."""
    return jnp.asarray(np.asarray(w).transpose(2, 3, 1, 0))


def conv_transpose_kernel(w: np.ndarray) -> jnp.ndarray:
    """torch ConvTranspose2d weight → flax ConvTranspose kernel."""
    return jnp.asarray(np.asarray(w).transpose(2, 3, 0, 1)[::-1, ::-1].copy())


def dense_kernel(w: np.ndarray) -> jnp.ndarray:
    """torch Linear weight (O, I) → flax Dense kernel (I, O)."""
    return jnp.asarray(np.asarray(w).T)


def _to_np(sd: Dict[str, Any]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def _import_sequential_convs(params: Dict, torch_prefix: str,
                             sd: Dict[str, np.ndarray],
                             transposed_from: int = 10 ** 9) -> None:
    """Map a reference Encoder/Decoder ``blocks`` Sequential onto our
    Encoder/Decoder params by enumerating conv layers in call order.

    Our modules name layers ``Conv_0..`` / ``ConvTranspose_0..`` and
    ``ResBlock_0..`` (each ResBlock has Conv_0 3×3 and Conv_1 1×1), in the
    same order the reference Sequential enumerates them."""
    # collect torch conv entries in call order: group keys by Sequential
    # index; inside a ResBlock the convs live at blocks.N.conv.{1,3}
    plen = len(torch_prefix) + 1
    by_idx: Dict[int, List[str]] = {}
    for k in sd:
        if k.startswith(torch_prefix + ".") and k.endswith(".weight"):
            rest = k[plen:]
            idx = int(rest.split(".")[0])
            by_idx.setdefault(idx, []).append(k)
    torch_convs: List[tuple] = []
    for i in sorted(by_idx):
        for k in sorted(by_idx[i],
                        key=lambda s: [int(t) if t.isdigit() else t
                                       for t in s.split(".")]):
            w = sd[k]
            if w.ndim == 4:
                torch_convs.append((w, sd.get(k[:-len("weight")] + "bias")))

    # our conv entries in call order
    ours: List[Dict] = []

    def visit(p: Dict):
        # deterministic flax naming order: Conv_k, ConvTranspose_k, ResBlock_k
        conv_keys = sorted([k for k in p if k.startswith("Conv_")],
                           key=lambda s: int(s.split("_")[1]))
        res_keys = sorted([k for k in p if k.startswith("ResBlock_")],
                          key=lambda s: int(s.split("_")[1]))
        tconv_keys = sorted([k for k in p if k.startswith("ConvTranspose_")],
                            key=lambda s: int(s.split("_")[1]))
        for k in conv_keys:
            ours.append(p[k])
        for k in res_keys:
            visit(p[k])
        for k in tconv_keys:
            ours.append(p[k])

    visit(params)
    assert len(ours) == len(torch_convs), (
        f"{torch_prefix}: {len(torch_convs)} torch convs vs {len(ours)} ours")
    for dst, (w, b) in zip(ours, torch_convs):
        dk = dst["kernel"].shape  # (kh, kw, in, out)
        as_conv = (w.shape[2], w.shape[3], w.shape[1], w.shape[0]) == tuple(dk)
        as_tconv = (w.shape[2], w.shape[3], w.shape[0], w.shape[1]) == tuple(dk)
        if as_conv and as_tconv:
            # in == out is ambiguous by shape; in these stacks only the
            # upsampling (4,4)-stride-2 layers are transposed, and every
            # square-channel conv here is 1x1 or 3x3 — disambiguate by kernel
            as_tconv = w.shape[2] == 4
            as_conv = not as_tconv
        if as_conv:
            dst["kernel"] = conv_kernel(w)
        elif as_tconv:
            dst["kernel"] = conv_transpose_kernel(w)
        else:
            raise ValueError(f"cannot map torch weight {w.shape} onto {dk}")
        if b is not None:
            dst["bias"] = jnp.asarray(b)


def import_vqvae(state_dict: Dict[str, Any], variables) -> Dict[str, Any]:
    """Convert a reference ``VQVAE`` state_dict (vqvae.py:169-259) into our
    :class:`vqvae2_tpu.models.vqvae.VQVAE` variables."""
    import flax

    sd = _to_np(state_dict)
    params = flax.core.unfreeze(variables["params"]) \
        if not isinstance(variables["params"], dict) else \
        jax_tree_copy(variables["params"])
    vq = jax_tree_copy(variables["vq_stats"])

    for enc, pref in (("enc_b", "enc_b.blocks"), ("enc_t", "enc_t.blocks")):
        _import_sequential_convs(params[enc], pref, sd)
    for dec, pref in (("dec_t", "dec_t.blocks"), ("dec", "dec.blocks")):
        _import_sequential_convs(params[dec], pref, sd)
    if "dec_ir" in params and any(k.startswith("dec_ir.") for k in sd):
        _import_sequential_convs(params["dec_ir"], "dec_ir.blocks", sd)

    for name in ("quantize_conv_t", "quantize_conv_b"):
        params[name]["kernel"] = conv_kernel(sd[f"{name}.weight"])
        params[name]["bias"] = jnp.asarray(sd[f"{name}.bias"])
    # upsample_t: single ConvTranspose (vqvae.py:200-202); reference may wrap
    # it in a Sequential ("upsample_t.0") or not
    up_key = "upsample_t.weight" if "upsample_t.weight" in sd else "upsample_t.0.weight"
    params["upsample_t"]["kernel"] = conv_transpose_kernel(sd[up_key])
    params["upsample_t"]["bias"] = jnp.asarray(sd[up_key.replace("weight", "bias")])

    for q in ("quantize_t", "quantize_b"):
        vq[q]["embed"] = jnp.asarray(sd[f"{q}.embed"].T)          # (K, D)
        vq[q]["embed_avg"] = jnp.asarray(sd[f"{q}.embed_avg"].T)
        vq[q]["cluster_size"] = jnp.asarray(sd[f"{q}.cluster_size"])

    out = dict(variables)
    out["params"] = params
    out["vq_stats"] = vq
    return out


def jax_tree_copy(tree):
    if isinstance(tree, dict):
        return {k: jax_tree_copy(v) for k, v in tree.items()}
    return tree
