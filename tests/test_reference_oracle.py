"""Oracle parity tests against the ACTUAL reference code.

The reference repo is importable read-only at /root/reference (torch, CPU).
Random-init reference modules are the ground truth: their state_dicts flow
through ``utils.torch_import`` and the outputs must reproduce — bit-exact
code indices, fp-tolerance reconstructions, matching PixelSNAIL logits, and
EMA-buffer equivalence after one training-mode forward
(reference ``vqvae.py:28-78,169-259``, ``pixelsnail.py:326-431``).
"""

import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not mounted")

if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

D, K = 8, 16  # embed_dim, n_embed for the tiny configs


def _seed(n=0):
    torch.manual_seed(n)
    return np.random.default_rng(n)


# ---------------------------------------------------------------------------
# Quantize: indices, straight-through output, diff, EMA buffers
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ref_module", ["vqvae", "vqvae_deep"])
def test_quantize_oracle(ref_module):
    ref = __import__(ref_module)
    from vqvae2_tpu.models.vqvae import Quantize

    g = _seed(0)
    rq = ref.Quantize(D, K)
    rq.train()
    x = g.normal(size=(2, 4, 4, D)).astype(np.float32)
    xt = torch.from_numpy(x)
    quant_t, diff_t, idx_t = rq(xt)

    q = Quantize(dim=D, n_embed=K)
    variables = q.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 1, D)))
    sd = rq.state_dict()
    variables = {"vq_stats": {
        "embed": jnp.asarray(sd["embed"].numpy().T),
        "cluster_size": jnp.asarray(sd["cluster_size"].numpy() * 0),
        "embed_avg": jnp.asarray(sd["embed_avg"].numpy().T),
    }}
    # NOTE: rq(xt) above already mutated the buffers; rebuild the pre-forward
    # state from a fresh module with the same seed
    torch.manual_seed(0)
    rq0 = ref.Quantize(D, K)
    variables = {"vq_stats": {
        "embed": jnp.asarray(rq0.embed.numpy().T),
        "cluster_size": jnp.asarray(rq0.cluster_size.numpy()),
        "embed_avg": jnp.asarray(rq0.embed_avg.numpy().T),
    }}
    (quant_j, diff_j, idx_j), new_vars = q.apply(
        variables, jnp.asarray(x), train=True, mutable=["vq_stats"])

    np.testing.assert_array_equal(np.asarray(idx_j), idx_t.numpy())
    np.testing.assert_allclose(np.asarray(quant_j),
                               quant_t.detach().numpy(), atol=1e-6)
    np.testing.assert_allclose(float(diff_j), float(diff_t), rtol=1e-5)

    # EMA buffers after the single training forward (vqvae.py:54-70)
    vq = new_vars["vq_stats"]
    np.testing.assert_allclose(np.asarray(vq["cluster_size"]),
                               rq.cluster_size.numpy(), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(vq["embed_avg"]),
                               rq.embed_avg.numpy().T, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vq["embed"]),
                               rq.embed.numpy().T, rtol=1e-4, atol=1e-6)


def test_quantize_straight_through_grad_oracle():
    import vqvae as ref
    from vqvae2_tpu.models.vqvae import Quantize

    g = _seed(1)
    torch.manual_seed(1)
    rq = ref.Quantize(D, K)
    rq.eval()
    x = g.normal(size=(3, 2, 2, D)).astype(np.float32)
    w = g.normal(size=(3, 2, 2, D)).astype(np.float32)

    xt = torch.from_numpy(x).requires_grad_(True)
    out_t, _, _ = rq(xt)
    (out_t * torch.from_numpy(w)).sum().backward()

    q = Quantize(dim=D, n_embed=K)
    variables = {"vq_stats": {
        "embed": jnp.asarray(rq.embed.numpy().T),
        "cluster_size": jnp.asarray(rq.cluster_size.numpy()),
        "embed_avg": jnp.asarray(rq.embed_avg.numpy().T),
    }}

    def f(xx):
        quant, _, _ = q.apply(variables, xx)
        return jnp.sum(quant * jnp.asarray(w))

    gx = jax.grad(f)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(gx), xt.grad.numpy(), atol=1e-6)


# ---------------------------------------------------------------------------
# VQVAE: encode indices bit-exact, recon within fp tolerance, EMA after train
# ---------------------------------------------------------------------------

def _tiny_ref_vqvae():
    import vqvae as ref

    torch.manual_seed(2)
    return ref.VQVAE(in_channel=3, channel=16, n_res_block=1,
                     n_res_channel=8, embed_dim=D, n_embed=K)


def _our_vqvae():
    from vqvae2_tpu.models.vqvae import VQVAE

    return VQVAE(channel=16, n_res_block=1, n_res_channel=8,
                 embed_dim=D, n_embed=K, with_ir_head=True)


def _import_into_ours(rm, model, x):
    from vqvae2_tpu.utils import torch_import as ti

    # forward_ir reaches the dec_ir head at init (plain __call__ skips it)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           method=model.forward_ir)
    return ti.import_vqvae(rm.state_dict(), variables)


@pytest.mark.slow
def test_vqvae_oracle_encode_and_forward():
    rm = _tiny_ref_vqvae()
    rm.eval()
    model = _our_vqvae()
    g = _seed(3)
    x = g.normal(size=(2, 32, 32, 3)).astype(np.float32)
    variables = _import_into_ours(rm, model, x)

    _, _, diff_j, id_t, id_b = model.apply(variables, jnp.asarray(x),
                                           method=model.encode)
    dec_j, _ = model.apply(variables, jnp.asarray(x))
    ir_j = model.apply(variables, jnp.asarray(x), method=model.forward_ir)[2]

    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        qt, qb, diff_t, rid_t, rid_b = rm.encode(xt)
        dec_t, _ = rm(xt)
        quant = torch.cat([rm.upsample_t(qt), qb], 1)
        ir_t = rm.dec_ir(quant)

    np.testing.assert_array_equal(np.asarray(id_t), rid_t.numpy())
    np.testing.assert_array_equal(np.asarray(id_b), rid_b.numpy())
    np.testing.assert_allclose(float(diff_j), float(diff_t), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dec_j),
                               dec_t.numpy().transpose(0, 2, 3, 1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ir_j),
                               ir_t.numpy().transpose(0, 2, 3, 1), atol=1e-4)


@pytest.mark.slow
def test_vqvae_oracle_ema_training_step():
    rm = _tiny_ref_vqvae()
    model = _our_vqvae()
    g = _seed(4)
    x = g.normal(size=(2, 32, 32, 3)).astype(np.float32)
    variables = _import_into_ours(rm, model, x)

    rm.train()
    with torch.no_grad():
        rm(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    _, new_vars = model.apply(variables, jnp.asarray(x), train=True,
                              mutable=["vq_stats"])
    for q, rq in (("quantize_t", rm.quantize_t), ("quantize_b", rm.quantize_b)):
        vq = new_vars["vq_stats"][q]
        np.testing.assert_allclose(np.asarray(vq["cluster_size"]),
                                   rq.cluster_size.numpy(),
                                   rtol=1e-4, atol=1e-7)
        np.testing.assert_allclose(np.asarray(vq["embed_avg"]),
                                   rq.embed_avg.numpy().T,
                                   rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(np.asarray(vq["embed"]),
                                   rq.embed.numpy().T, rtol=1e-3, atol=1e-5)


# ---------------------------------------------------------------------------
# PixelSNAIL: logits parity, top (attention) and bottom (conditional) configs
# ---------------------------------------------------------------------------

def _pixelsnail_pair(attention: bool, conditional: bool, n_out_res_block=0):
    import pixelsnail as refmod
    from vqvae2_tpu.models.pixelsnail import PixelSNAIL
    from vqvae2_tpu.utils import torch_import as ti

    torch.manual_seed(5)
    kw = dict(shape=[8, 8], n_class=K, channel=16, kernel_size=5, n_block=2,
              n_res_block=2, res_channel=16, attention=attention, dropout=0.0,
              n_out_res_block=n_out_res_block)
    if conditional:
        kw.update(n_cond_res_block=1, cond_res_channel=16)
    rm = refmod.PixelSNAIL(**kw)
    rm.eval()

    ours = PixelSNAIL(shape=(8, 8), n_class=K, channel=16, kernel_size=5,
                      n_block=2, n_res_block=2, res_channel=16,
                      attention=attention, dropout=0.0,
                      n_out_res_block=n_out_res_block,
                      n_cond_res_block=1 if conditional else 0,
                      cond_res_channel=16 if conditional else 0)
    g = _seed(6)
    codes = g.integers(0, K, size=(2, 8, 8)).astype(np.int32)
    cond = g.integers(0, K, size=(2, 4, 4)).astype(np.int32) \
        if conditional else None

    with torch.no_grad():
        # the reference zeroes causal weight_v in-place on forward
        # (pixelsnail.py:114-115) — run it first so the exported state_dict
        # carries the post-zeroing buffers it always trains with
        ref_logits, _ = rm(
            torch.from_numpy(codes).long(),
            condition=torch.from_numpy(cond).long() if conditional else None)

    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(codes),
                          condition=jnp.asarray(cond) if conditional else None)
    variables = ti.import_pixelsnail(rm.state_dict(), variables)
    logits = ours.apply(variables, jnp.asarray(codes),
                        condition=jnp.asarray(cond) if conditional else None)
    return np.asarray(logits), ref_logits.numpy().transpose(0, 2, 3, 1)


@pytest.mark.slow
def test_pixelsnail_top_oracle():
    ours, ref = _pixelsnail_pair(attention=True, conditional=False,
                                 n_out_res_block=1)
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-3)


@pytest.mark.slow
def test_pixelsnail_bottom_oracle():
    ours, ref = _pixelsnail_pair(attention=False, conditional=True)
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-3)


# ---------------------------------------------------------------------------
# VQVAE_Deep: codes, quant latents, styled decode (vqvae_deep.py:234-320)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_vqvae_deep_oracle():
    import vqvae_deep as ref

    from vqvae2_tpu.models.vqvae_deep import VQVAE_Deep
    from vqvae2_tpu.utils import torch_import as ti

    g = _seed(4)
    cfg = dict(channel=32, n_res_block=2, n_res_channel=16, embed_dim=D,
               n_embed=K, style_dim=8)
    rm = ref.VQVAE_Deep(in_channel=3, out_channel=3, **cfg).eval()
    model = VQVAE_Deep(in_channel=3, out_channel=3, **cfg)

    x = g.normal(size=(2, 32, 32, 3)).astype(np.float32)
    s = g.normal(size=(2, 8)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           jnp.asarray(s))
    variables = ti.import_vqvae_deep(rm.state_dict(), variables)

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    st = torch.from_numpy(s)
    with torch.no_grad():
        enc_b_t, enc_t_t = rm.encode(xt)
        quant_t_t, quant_b_t, diff_t, id_t_t, id_b_t = rm.quantize(
            enc_b_t, enc_t_t)
        quant_full = torch.cat([rm.upsample_t(quant_t_t), quant_b_t], 1)
        # reference forward() calls self.decode(quant) without the style the
        # decoder requires (vqvae_deep.py:279 — known bug); drive dec directly
        dec_t = rm.dec(quant_full, st)

    enc_b, enc_t = model.apply(variables, jnp.asarray(x), method=model.encode)
    quant_t, quant_b, diff, id_t, id_b = model.apply(
        variables, enc_b, enc_t, method=model.quantize)
    # bit-exact code indices
    np.testing.assert_array_equal(np.asarray(id_t),
                                  id_t_t.numpy())
    np.testing.assert_array_equal(np.asarray(id_b),
                                  id_b_t.numpy())
    np.testing.assert_allclose(np.asarray(quant_t),
                               quant_t_t.permute(0, 2, 3, 1).numpy(),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(float(diff), float(diff_t.sum()), atol=1e-5)

    dec, diff2, quant = model.apply(variables, jnp.asarray(x), jnp.asarray(s))
    np.testing.assert_allclose(np.asarray(quant),
                               quant_full.permute(0, 2, 3, 1).numpy(),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dec),
                               dec_t.permute(0, 2, 3, 1).numpy(),
                               atol=5e-4, rtol=1e-4)
