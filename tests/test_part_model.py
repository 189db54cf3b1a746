"""Part-parsing model tests (tiny resnet18 config for CI speed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae2_tpu.part.part_model import (
    EmbedNet2,
    EdgeModule,
    DecoderModule,
    PSPModule,
    PartModel,
    NonLocalSelf,
)


def test_psp_module(rng):
    x = jnp.asarray(rng.normal(size=(2, 12, 6, 32)), jnp.float32)
    m = PSPModule(out_features=16)
    v = m.init(jax.random.PRNGKey(0), x)
    out, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 12, 6, 16)


@pytest.mark.slow
def test_edge_decoder_partmodel(rng):
    # feature pyramid mimicking resnet stages at 48x24 input
    x1 = jnp.asarray(rng.normal(size=(2, 12, 6, 64)), jnp.float32)
    x2 = jnp.asarray(rng.normal(size=(2, 6, 3, 128)), jnp.float32)
    x3 = jnp.asarray(rng.normal(size=(2, 3, 2, 256)), jnp.float32)
    x4 = jnp.asarray(rng.normal(size=(2, 3, 2, 512)), jnp.float32)

    em = EdgeModule()
    v = em.init(jax.random.PRNGKey(0), x1, x2, x3)
    edge, edge_fea = em.apply(v, x1, x2, x3)
    assert edge.shape == (2, 12, 6, 2)
    assert edge_fea.shape == (2, 12, 6, 256 * 3)

    pm = PartModel(num_part=7)
    v = pm.init(jax.random.PRNGKey(0), x4, x1, x2, x3)
    (preds, fea), _ = pm.apply(v, x4, x1, x2, x3, train=True,
                               mutable=["batch_stats"],
                               rngs={"dropout": jax.random.PRNGKey(1)})
    (parsing, fusion), (edge_p,) = preds
    assert parsing.shape == (2, 12, 6, 7)
    assert fusion.shape == (2, 12, 6, 7)
    assert edge_p.shape == (2, 12, 6, 2)


def test_nonlocal_self_identity_at_init(rng):
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 8)), jnp.float32)
    m = NonLocalSelf()
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


@pytest.mark.slow
def test_embed_net2_forward(rng):
    model = EmbedNet2(class_num=5, arch="resnet18", part_num=7)
    rgb = jnp.asarray(rng.normal(size=(2, 96, 48, 3)), jnp.float32)
    ir = jnp.asarray(rng.normal(size=(2, 96, 48, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), xRGB=rgb, xIR=ir, modal=0,
                           train=True)
    out, _ = model.apply(variables, xRGB=rgb, xIR=ir, modal=0, train=True,
                         mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)})
    (feats, score, part_preds, loss_reg, mf_x3, mf, part_masks, parts_score,
     feats_p, score_p) = out
    n = 4  # rgb+ir concat
    assert feats.shape == (n, 512 + 6 * 256)
    assert score.shape == (n, 5)
    assert len(parts_score) == 6 and parts_score[0].shape == (n, 5)
    assert feats_p.shape == (n, 6 * 256) and score_p.shape == (n, 5)
    assert part_masks.shape[-1] == 7
    assert mf.shape == (n, 6, 512) and mf_x3.shape == (n, 6, 256)

    # eval mode
    f1, f2 = model.apply(variables, xRGB=rgb, modal=1)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(f2, axis=1)), 1.0,
                               rtol=1e-4)


@pytest.mark.slow
def test_reid_train_step_bf16(rng):
    """--bf16 path of train/reid.py: bf16 model compute, fp32 params and
    losses, finite metrics after one optimizer step."""
    import optax

    from vqvae2_tpu.train.reid import ReidState, make_train_step

    n_ids, num_pos, hw = 2, 2, (96, 48)
    n = n_ids * num_pos
    model = EmbedNet2(class_num=4, arch="resnet18", dtype=jnp.bfloat16)
    mk = lambda: jnp.asarray(rng.normal(size=(n, *hw, 3)), jnp.float32)
    batch = {"rgb": mk(), "ir": mk(), "gray": mk(),
             "label": jnp.asarray(np.repeat(np.arange(n_ids), num_pos)
                                  .astype(np.int32)),
             "part1": jnp.asarray(rng.integers(0, 7, size=(n, *hw))
                                  .astype(np.int32)),
             "part2": jnp.asarray(rng.integers(0, 7, size=(n, *hw))
                                  .astype(np.int32))}
    probe = jnp.zeros((1, *hw, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), xRGB=probe, xIR=probe,
                           xZ=probe, modal=0, train=True)
    tx = optax.sgd(1e-2)
    state = ReidState(step=jnp.zeros((), jnp.int32),
                      params=variables["params"],
                      batch_stats=variables["batch_stats"],
                      opt_state=tx.init(variables["params"]))
    step = make_train_step(model, tx, num_pos, n_ids, hw)
    state, metrics = step(state, batch,
                          jax.random.key(1, impl="unsafe_rbg"))
    for k, v in metrics.items():
        assert v.dtype == jnp.float32 and np.isfinite(float(v)), (k, v)
    # params never leave fp32 (bf16 is compute-only)
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(l.dtype == jnp.float32 for l in leaves)
