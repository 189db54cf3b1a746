"""Equivalence tests for the incremental cached-decode sampler: teacher-forced
incremental logits must match the full PixelSNAIL forward position by
position, for both the attention (top) and conditional (bottom) configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae2_tpu.models.incremental import (
    sample_prior_incremental,
    teacher_forced_logits,
)
from vqvae2_tpu.models.pixelsnail import PixelSNAIL


@pytest.mark.slow
def test_incremental_matches_full_forward_top(rng):
    model = PixelSNAIL(shape=(6, 6), n_class=8, channel=16, kernel_size=5,
                       n_block=2, n_res_block=2, res_channel=16, dropout=0.0,
                       n_out_res_block=1)
    codes = jnp.asarray(rng.integers(0, 8, size=(2, 6, 6)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), codes)

    full = model.apply(variables, codes)
    inc = teacher_forced_logits(model, variables, codes)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(full),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_incremental_matches_full_forward_bottom(rng):
    model = PixelSNAIL(shape=(8, 8), n_class=8, channel=16, kernel_size=5,
                       n_block=2, n_res_block=2, res_channel=16,
                       attention=False, dropout=0.0,
                       n_cond_res_block=1, cond_res_channel=16)
    codes = jnp.asarray(rng.integers(0, 8, size=(2, 8, 8)), jnp.int32)
    top = jnp.asarray(rng.integers(0, 8, size=(2, 4, 4)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), codes, condition=top)

    full = model.apply(variables, codes, condition=top)
    inc = teacher_forced_logits(model, variables, codes, condition=top)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(full),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_incremental_sampler_runs(rng):
    model = PixelSNAIL(shape=(4, 4), n_class=8, channel=16, kernel_size=5,
                       n_block=1, n_res_block=1, res_channel=16, dropout=0.0)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4), jnp.int32))
    codes = sample_prior_incremental(model, variables, jax.random.PRNGKey(1), 2)
    assert codes.shape == (2, 4, 4)
    assert int(codes.min()) >= 0 and int(codes.max()) < 8
    # deterministic per rng
    codes2 = sample_prior_incremental(model, variables, jax.random.PRNGKey(1), 2)
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(codes2))


@pytest.mark.slow
def test_incremental_sampler_matches_full_sampler_distributionally(rng):
    """Same rng stream + same per-step logits → identical draws as the
    full-forward sampler."""
    from vqvae2_tpu.models.sampling import sample_prior

    model = PixelSNAIL(shape=(4, 4), n_class=8, channel=16, kernel_size=5,
                       n_block=1, n_res_block=1, res_channel=16, dropout=0.0)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4), jnp.int32))
    a = sample_prior(model, variables, jax.random.PRNGKey(7), 2, (4, 4))
    b = sample_prior_incremental(model, variables, jax.random.PRNGKey(7), 2)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
