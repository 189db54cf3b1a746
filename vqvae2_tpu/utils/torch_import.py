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
        # .copy() is load-bearing: torch .numpy() returns a VIEW, and on CPU
        # jnp.asarray can alias it zero-copy — a later in-place torch mutation
        # (e.g. the reference's EMA buffer updates) would leak into the
        # imported jax arrays.
        arr = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        out[k] = np.array(arr, copy=True)
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


def _set_conv(dst: Dict, tpre: str, sd) -> None:
    dst["kernel"] = conv_kernel(sd[f"{tpre}.weight"])
    if f"{tpre}.bias" in sd:
        dst["bias"] = jnp.asarray(sd[f"{tpre}.bias"])


def _import_deep_decoder(p: Dict, tpre: str, sd) -> None:
    """Reference deep ``Decoder`` (vqvae_deep.py:177-229): named ``conv1``,
    ``blocks`` of ResBlock or AdainResBlk, ``up_sample`` Sequential of
    transposed convs.  The torch AdainResBlk carries a dead ``conv``
    Sequential (vqvae_deep.py:120-125, never called) — skipped."""
    _set_conv(p["conv1"], f"{tpre}.conv1", sd)
    j = 0
    while True:
        if f"ResBlock_{j}" in p:  # plain residual (conv.1 3×3, conv.3 1×1)
            rb = p[f"ResBlock_{j}"]
            _set_conv(rb["Conv_0"], f"{tpre}.blocks.{j}.conv.1", sd)
            _set_conv(rb["Conv_1"], f"{tpre}.blocks.{j}.conv.3", sd)
        elif f"adain{j}" in p:    # AdaIN residual (vqvae_deep.py:112-134)
            ab = p[f"adain{j}"]
            _set_conv(ab["conv1"], f"{tpre}.blocks.{j}.conv1", sd)
            _set_conv(ab["conv2"], f"{tpre}.blocks.{j}.conv2", sd)
            for norm in ("norm1", "norm2"):
                fc = ab[norm]["fc"]
                fc["kernel"] = dense_kernel(sd[f"{tpre}.blocks.{j}.{norm}.fc.weight"])
                fc["bias"] = jnp.asarray(sd[f"{tpre}.blocks.{j}.{norm}.fc.bias"])
        else:
            break
        j += 1
    ups = sorted((int(k.split(".")[-2]), k) for k in sd
                 if k.startswith(f"{tpre}.up_sample.") and k.endswith(".weight"))
    tkeys = sorted((k for k in p if k.startswith("ConvTranspose_")),
                   key=lambda s: int(s.split("_")[1]))
    assert len(ups) == len(tkeys), (tpre, len(ups), len(tkeys))
    for (idx, k), ours in zip(ups, tkeys):
        p[ours]["kernel"] = conv_transpose_kernel(sd[k])
        p[ours]["bias"] = jnp.asarray(sd[k[:-len("weight")] + "bias"])


def import_vqvae_deep(state_dict: Dict[str, Any], variables) -> Dict[str, Any]:
    """Convert a reference ``VQVAE_Deep`` state_dict (vqvae_deep.py:234-320)
    into our :class:`vqvae2_tpu.models.vqvae_deep.VQVAE_Deep` variables —
    encoders via Sequential enumeration, deep decoders via
    :func:`_import_deep_decoder` (incl. the AdaIN style projectors), quantizer
    EMA buffers transposed to (K, D)."""
    sd = _to_np(state_dict)
    params = jax_tree_copy(variables["params"])
    vq = jax_tree_copy(variables["vq_stats"])

    for enc, pref in (("enc_b", "enc_b.blocks"), ("enc_t", "enc_t.blocks")):
        _import_sequential_convs(params[enc], pref, sd)
    _import_deep_decoder(params["dec_t"], "dec_t", sd)
    _import_deep_decoder(params["dec"], "dec", sd)

    for name in ("quantize_conv_t", "quantize_conv_b"):
        _set_conv(params[name], name, sd)
    up_key = ("upsample_t.weight" if "upsample_t.weight" in sd
              else "upsample_t.0.weight")
    params["upsample_t"]["kernel"] = conv_transpose_kernel(sd[up_key])
    params["upsample_t"]["bias"] = jnp.asarray(
        sd[up_key.replace("weight", "bias")])

    for q in ("quantize_t", "quantize_b"):
        vq[q]["embed"] = jnp.asarray(sd[f"{q}.embed"].T)          # (K, D)
        vq[q]["embed_avg"] = jnp.asarray(sd[f"{q}.embed_avg"].T)
        vq[q]["cluster_size"] = jnp.asarray(sd[f"{q}.cluster_size"])

    out = dict(variables)
    out["params"] = params
    out["vq_stats"] = vq
    return out


def import_pixelsnail(state_dict: Dict[str, Any], variables) -> Dict[str, Any]:
    """Convert a reference ``PixelSNAIL`` state_dict (pixelsnail.py:326-395)
    into our :class:`vqvae2_tpu.models.pixelsnail.PixelSNAIL` variables.

    Weight-norm layout: torch ``weight_norm`` stores ``weight_v`` (O,I,kH,kW)
    + ``weight_g`` (O,1,1,1) per output channel → our ``v`` (kH,kW,I,O) +
    ``g`` (O,).  The reference's runtime causal zeroing of ``weight_v``
    (pixelsnail.py:114-115) needs no translation: our static kernel mask
    zeroes the same taps before the norm, which is what the reference
    computes after its first forward mutates the buffer."""
    sd = _to_np(state_dict)
    params = jax_tree_copy(variables["params"])

    def set_wn(dst: Dict, tpre: str, transpose) -> None:
        dst["v"] = jnp.asarray(transpose(sd[f"{tpre}.weight_v"]))
        dst["g"] = jnp.asarray(sd[f"{tpre}.weight_g"].reshape(-1))
        if f"{tpre}.bias" in sd:
            dst["b"] = jnp.asarray(sd[f"{tpre}.bias"])

    def set_wnconv(dst: Dict, tpre: str) -> None:
        # torch WNConv2d module: the weight-normed Conv2d lives at ``.conv``
        set_wn(dst, f"{tpre}.conv", lambda w: w.transpose(2, 3, 1, 0))

    def set_wndense(dst: Dict, tpre: str) -> None:
        set_wn(dst, tpre, lambda w: w.T)

    def set_causal(dst: Dict, tpre: str) -> None:
        # torch CausalConv2d wraps a WNConv2d at ``.conv``
        set_wnconv(dst["WNConv_0"], f"{tpre}.conv")

    def set_gated(dst: Dict, tpre: str) -> None:
        for cn in ("conv1", "conv2"):
            if f"{tpre}.{cn}.conv.conv.weight_v" in sd:   # causal variant
                set_causal(dst[cn], f"{tpre}.{cn}")
            else:                                          # plain wnconv2d
                set_wnconv(dst[cn], f"{tpre}.{cn}")
        if "aux_conv" in dst:
            set_wnconv(dst["aux_conv"], f"{tpre}.aux_conv")
        if "condition" in dst:
            set_wnconv(dst["condition"], f"{tpre}.condition")

    set_causal(params["horizontal"], "horizontal")
    set_causal(params["vertical"], "vertical")

    i = 0
    while f"blocks_{i}" in params:
        bp, tp = params[f"blocks_{i}"], f"blocks.{i}"
        j = 0
        while f"res{j}" in bp:
            set_gated(bp[f"res{j}"], f"{tp}.resblocks.{j}")
            j += 1
        if "key_resblock" in bp:   # attention head (pixelsnail.py:266-285)
            set_gated(bp["key_resblock"], f"{tp}.key_resblock")
            set_gated(bp["query_resblock"], f"{tp}.query_resblock")
            set_gated(bp["out_resblock"], f"{tp}.out_resblock")
            for n in ("query", "key", "value"):
                set_wndense(bp["causal_attention"][n],
                            f"{tp}.causal_attention.{n}")
        if "out" in bp:            # attention-free tail (pixelsnail.py:287)
            set_wnconv(bp["out"], f"{tp}.out")
        i += 1

    if "cond_resnet" in params:
        cp = params["cond_resnet"]
        set_wnconv(cp["conv_in"], "cond_resnet.blocks.0")
        j = 0
        while f"res{j}" in cp:
            set_gated(cp[f"res{j}"], f"cond_resnet.blocks.{j + 1}")
            j += 1

    # reference ``out`` Sequential = n_out_res_block GatedResBlocks, ELU, conv
    j = 0
    while f"out_res_{j}" in params:
        set_gated(params[f"out_res_{j}"], f"out.{j}")
        j += 1
    set_wnconv(params["out_conv"], f"out.{j + 1}")

    out = dict(variables)
    out["params"] = params
    return out
