"""End-to-end two-stage pipeline test (the reference README workflow,
README.md:22-34): train VQ-VAE → extract codes → train priors → sample →
decode. Tiny configs, CPU mesh, but every stage runs for real."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae2_tpu import parallel as par
from vqvae2_tpu.data.codestore import CodeStore, CodeStoreWriter
from vqvae2_tpu.data.datasets import SyntheticImages
from vqvae2_tpu.models.sampling import sample_prior
from vqvae2_tpu.models.vqvae import VQVAE


def test_sampler_basic():
    from vqvae2_tpu.models.pixelsnail import PixelSNAIL

    model = PixelSNAIL(shape=(4, 4), n_class=8, channel=16, kernel_size=5,
                       n_block=1, n_res_block=1, res_channel=16, dropout=0.0)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4), jnp.int32))

    codes = sample_prior(model, variables, jax.random.PRNGKey(1), 2, (4, 4))
    assert codes.shape == (2, 4, 4) and codes.dtype == jnp.int32
    assert int(codes.min()) >= 0 and int(codes.max()) < 8

    # deterministic given rng; different rng differs
    codes2 = sample_prior(model, variables, jax.random.PRNGKey(1), 2, (4, 4))
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(codes2))
    codes3 = sample_prior(model, variables, jax.random.PRNGKey(2), 2, (4, 4))
    assert not np.array_equal(np.asarray(codes), np.asarray(codes3))


@pytest.mark.slow
def test_sampler_conditional():
    from vqvae2_tpu.models.pixelsnail import PixelSNAIL

    model = PixelSNAIL(shape=(4, 4), n_class=8, channel=16, kernel_size=5,
                       n_block=1, n_res_block=1, res_channel=16,
                       attention=False, dropout=0.0,
                       n_cond_res_block=1, cond_res_channel=16)
    top = jnp.zeros((2, 2, 2), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((2, 4, 4), jnp.int32), condition=top)
    c1 = sample_prior(model, variables, jax.random.PRNGKey(1), 2, (4, 4),
                      condition=top)
    c2 = sample_prior(model, variables, jax.random.PRNGKey(1), 2, (4, 4),
                      condition=(top + 5) % 8)
    assert c1.shape == (2, 4, 4)
    assert not np.array_equal(np.asarray(c1), np.asarray(c2))


@pytest.mark.slow
def test_two_stage_pipeline(tmp_path):
    """Full pipeline on tiny shapes: stage-1 train → extract → stage-2 train
    (top + bottom) → hierarchical sample → decode_code."""
    import optax
    from vqvae2_tpu.train.vqvae import create_state, make_train_step
    from vqvae2_tpu.train import pixelsnail as ps_train
    from vqvae2_tpu.train.extract_codes import extract

    size = 32  # top 4x4, bottom 8x8
    mesh = par.default_mesh()
    dataset = SyntheticImages(n=32, size=size)

    # ---- stage 1
    model = VQVAE(channel=16, n_res_block=1, n_res_channel=8, embed_dim=8,
                  n_embed=16)
    tx = optax.adam(1e-3)
    state = create_state(model, tx, jax.random.PRNGKey(0), (1, size, size, 3))
    step = make_train_step(model, tx)
    from vqvae2_tpu.data.datasets import iterate_batches
    for imgs, labels, paths in iterate_batches(dataset, 8, epochs=2):
        state, metrics = step(state, par.shard_batch(imgs, mesh))
    assert np.isfinite(float(metrics["loss"]))
    variables = {"params": state.params, "vq_stats": state.vq_stats}

    # ---- extract codes
    store_path = str(tmp_path / "codes.vq2")
    n = extract(model, variables, dataset, store_path, batch_size=8, size=size)
    assert n == 32
    store = CodeStore(store_path)
    assert store.top_shape == (4, 4) and store.bot_shape == (8, 8)

    # ---- stage 2, top + bottom (few steps)
    args = ps_train.build_argparser().parse_args([
        store_path, "--steps", "3", "--batch", "8", "--channel", "16",
        "--n_res_block", "1", "--n_res_channel", "16", "--n_class", "16",
        "--n_cond_res_block", "1", "--log_every", "1",
    ])
    args.hier = "top"
    m_top = ps_train.train(args)
    assert np.isfinite(m_top["loss"])
    args.hier = "bottom"
    m_bot = ps_train.train(args)
    assert np.isfinite(m_bot["loss"])

    # ---- sample hierarchy with fresh tiny priors + decode
    top_model = ps_train.build_model("top", args, code_hw=(4, 8))
    top_vars = top_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4), jnp.int32))
    bot_model = ps_train.build_model("bottom", args, code_hw=(4, 8))
    bot_vars = bot_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8), jnp.int32),
                              condition=jnp.zeros((1, 4, 4), jnp.int32))
    top = sample_prior(top_model, top_vars, jax.random.PRNGKey(1), 2, (4, 4))
    top = jnp.clip(top, 0, 15)
    bottom = sample_prior(bot_model, bot_vars, jax.random.PRNGKey(2), 2, (8, 8),
                          condition=top)
    decoded = model.apply(variables, top, bottom, method=model.decode_code)
    assert decoded.shape == (2, size, size, 3)
    assert bool(jnp.all(jnp.isfinite(decoded)))
