"""Torch-checkpoint import tests: kernel layout mappings pinned against torch
numerics, and end-to-end VQVAE import verified by running the same reference
state_dict through an independent torch-functional evaluator — encode outputs
and code indices must match."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vqvae2_tpu.models.vqvae import VQVAE
from vqvae2_tpu.utils import torch_import as ti

C, RC, D, K = 16, 8, 8, 16  # channel, res_channel, embed_dim, n_embed


def test_conv_mappings_match_torch(rng):
    from flax import linen as nn

    x = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))

    tc = torch.nn.Conv2d(3, 5, 4, stride=2, padding=1)
    with torch.no_grad():
        ref = tc(xt).numpy().transpose(0, 2, 3, 1)
    fc = nn.Conv(5, (4, 4), strides=(2, 2), padding="SAME")
    out = fc.apply({"params": {
        "kernel": ti.conv_kernel(tc.weight.detach().numpy()),
        "bias": jnp.asarray(tc.bias.detach().numpy())}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    tt = torch.nn.ConvTranspose2d(3, 5, 4, stride=2, padding=1)
    with torch.no_grad():
        reft = tt(xt).numpy().transpose(0, 2, 3, 1)
    ft = nn.ConvTranspose(5, (4, 4), strides=(2, 2), padding="SAME")
    outt = ft.apply({"params": {
        "kernel": ti.conv_transpose_kernel(tt.weight.detach().numpy()),
        "bias": jnp.asarray(tt.bias.detach().numpy())}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(outt), reft, atol=1e-5)


# ---------------------------------------------------------------------------
# reference-layout state_dict fixture + independent torch evaluator
# ---------------------------------------------------------------------------

def _conv(sd, name, cin, cout, k, g):
    sd[f"{name}.weight"] = torch.from_numpy(
        (g.normal(size=(cout, cin, k, k)) * 0.2).astype(np.float32))
    sd[f"{name}.bias"] = torch.from_numpy(
        (g.normal(size=(cout,)) * 0.1).astype(np.float32))


def _tconv(sd, name, cin, cout, g):
    sd[f"{name}.weight"] = torch.from_numpy(
        (g.normal(size=(cin, cout, 4, 4)) * 0.2).astype(np.float32))
    sd[f"{name}.bias"] = torch.from_numpy(
        (g.normal(size=(cout,)) * 0.1).astype(np.float32))


def make_reference_state_dict(g):
    """Random weights under the reference VQVAE's state_dict keys
    (vqvae.py:169-213 layer layout, tiny config)."""
    sd = {}
    # enc_b stride4: conv4(3->C/2) relu conv4(C/2->C) relu conv3(C->C) res relu
    _conv(sd, "enc_b.blocks.0", 3, C // 2, 4, g)
    _conv(sd, "enc_b.blocks.2", C // 2, C, 4, g)
    _conv(sd, "enc_b.blocks.4", C, C, 3, g)
    _conv(sd, "enc_b.blocks.5.conv.1", C, RC, 3, g)
    _conv(sd, "enc_b.blocks.5.conv.3", RC, C, 1, g)
    # enc_t stride2
    _conv(sd, "enc_t.blocks.0", C, C // 2, 4, g)
    _conv(sd, "enc_t.blocks.2", C // 2, C, 3, g)
    _conv(sd, "enc_t.blocks.3.conv.1", C, RC, 3, g)
    _conv(sd, "enc_t.blocks.3.conv.3", RC, C, 1, g)
    _conv(sd, "quantize_conv_t", C, D, 1, g)
    for q in ("quantize_t", "quantize_b"):
        sd[f"{q}.embed"] = torch.from_numpy(
            g.normal(size=(D, K)).astype(np.float32))
        sd[f"{q}.embed_avg"] = sd[f"{q}.embed"].clone()
        sd[f"{q}.cluster_size"] = torch.zeros(K)
    # dec_t stride2: conv3(D->C) res relu ct(C->D)
    _conv(sd, "dec_t.blocks.0", D, C, 3, g)
    _conv(sd, "dec_t.blocks.1.conv.1", C, RC, 3, g)
    _conv(sd, "dec_t.blocks.1.conv.3", RC, C, 1, g)
    _tconv(sd, "dec_t.blocks.3", C, D, g)
    _conv(sd, "quantize_conv_b", D + C, D, 1, g)
    _tconv(sd, "upsample_t", D, D, g)
    # dec stride4: conv3(2D->C) res relu ct(C->C/2) relu ct(C/2->3)
    _conv(sd, "dec.blocks.0", 2 * D, C, 3, g)
    _conv(sd, "dec.blocks.1.conv.1", C, RC, 3, g)
    _conv(sd, "dec.blocks.1.conv.3", RC, C, 1, g)
    _tconv(sd, "dec.blocks.3", C, C // 2, g)
    _tconv(sd, "dec.blocks.5", C // 2, 3, g)
    return sd


def torch_eval_encode(sd, x_nchw):
    """Independent functional evaluation of the reference encode path
    (vqvae.py:223-240) directly from the state_dict."""
    w = lambda n: sd[f"{n}.weight"]
    b = lambda n: sd[f"{n}.bias"]
    conv = lambda x, n, s=1, p=0: F.conv2d(x, w(n), b(n), stride=s, padding=p)
    tconv = lambda x, n: F.conv_transpose2d(x, w(n), b(n), stride=2, padding=1)

    def res(x, n):
        h = conv(F.relu(x), f"{n}.conv.1", p=1)
        return x + conv(F.relu(h), f"{n}.conv.3")

    h = conv(x_nchw, "enc_b.blocks.0", s=2, p=1).relu()
    h = conv(h, "enc_b.blocks.2", s=2, p=1).relu()
    h = conv(h, "enc_b.blocks.4", p=1)
    enc_b = F.relu(res(h, "enc_b.blocks.5"))

    h = conv(enc_b, "enc_t.blocks.0", s=2, p=1).relu()
    h = conv(h, "enc_t.blocks.2", p=1)
    enc_t = F.relu(res(h, "enc_t.blocks.3"))

    def quantize(z_nchw, q):
        z = z_nchw.permute(0, 2, 3, 1).reshape(-1, D)
        embed = sd[f"{q}.embed"]  # (D, K)
        dist = (z.pow(2).sum(1, keepdim=True) - 2 * z @ embed
                + embed.pow(2).sum(0, keepdim=True))
        idx = (-dist).max(1)[1]
        quant = F.embedding(idx, embed.t())
        return idx, quant

    qt_in = conv(enc_t, "quantize_conv_t")
    id_t, quant_t_flat = quantize(qt_in, "quantize_t")
    hh, ww = qt_in.shape[2], qt_in.shape[3]
    quant_t = quant_t_flat.reshape(1, hh, ww, D).permute(0, 3, 1, 2)

    h = conv(quant_t, "dec_t.blocks.0", p=1)
    h = F.relu(res(h, "dec_t.blocks.1"))
    dec_t = tconv(h, "dec_t.blocks.3")
    cat = torch.cat([dec_t, enc_b], 1)
    qb_in = conv(cat, "quantize_conv_b")
    id_b, _ = quantize(qb_in, "quantize_b")
    return id_t.reshape(1, hh, ww), id_b.reshape(1, hh * 2, ww * 2)


def test_vqvae_import_code_index_parity(rng):
    sd = make_reference_state_dict(rng)
    model = VQVAE(channel=C, n_res_block=1, n_res_channel=RC,
                  embed_dim=D, n_embed=K)
    x = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = ti.import_vqvae(sd, variables)

    _, _, _, id_t, id_b = model.apply(variables, jnp.asarray(x),
                                      method=model.encode)

    with torch.no_grad():
        ref_t, ref_b = torch_eval_encode(
            sd, torch.from_numpy(x.transpose(0, 3, 1, 2)))

    np.testing.assert_array_equal(np.asarray(id_t), ref_t.numpy())
    np.testing.assert_array_equal(np.asarray(id_b), ref_b.numpy())
