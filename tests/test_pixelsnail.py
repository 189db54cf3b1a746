"""PixelSNAIL tests — the critical one is the causality property (SURVEY.md §4):
logits at raster position p must be independent of code inputs at positions
>= p. This covers the causal conv masks, the shifts, and the attention mask
all at once."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae2_tpu.models.pixelsnail import (
    CausalAttention,
    CausalConv,
    PixelSNAIL,
    WNConv,
    shift_down,
    shift_right,
)


def tiny_top(shape=(6, 6), attention=True, **kw):
    return PixelSNAIL(
        shape=shape, n_class=8, channel=16, kernel_size=5, n_block=1,
        n_res_block=1, res_channel=16, attention=attention, dropout=0.0, **kw,
    )


def test_shifts():
    x = jnp.arange(2 * 3 * 4 * 1, dtype=jnp.float32).reshape(2, 3, 4, 1)
    d = shift_down(x)
    assert bool(jnp.all(d[:, 0] == 0)) and bool(jnp.all(d[:, 1:] == x[:, :-1]))
    r = shift_right(x)
    assert bool(jnp.all(r[:, :, 0] == 0)) and bool(jnp.all(r[:, :, 1:] == x[:, :, :-1]))


def test_wnconv_weight_norm_init():
    """At init, weight-normed conv == plain conv with kernel v (g = ‖v‖)."""
    conv = WNConv(4, (3, 3), padding=((1, 1), (1, 1)))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 5, 5, 2)), jnp.float32)
    v = conv.init(jax.random.PRNGKey(0), x)
    kernel = v["params"]["v"]
    y = conv.apply(v, x)
    ref = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("attention", [True, False])
def test_pixelsnail_causality(attention):
    h = w = 5
    model = tiny_top(shape=(h, w), attention=attention)
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 8, size=(1, h, w)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), codes)

    logits = model.apply(variables, codes)
    assert logits.shape == (1, h, w, 8)

    # perturb each position; logits at raster-earlier-or-equal positions
    # must be bit-identical.
    flat = np.asarray(codes).reshape(-1).copy()
    base = np.asarray(logits).reshape(h * w, 8)
    for p in [0, 1, w - 1, w, w + 2, h * w - 1]:
        pert = flat.copy()
        pert[p] = (pert[p] + 3) % 8
        out = model.apply(variables, jnp.asarray(pert.reshape(1, h, w)))
        out = np.asarray(out).reshape(h * w, 8)
        np.testing.assert_array_equal(
            out[: p + 1], base[: p + 1],
            err_msg=f"position {p} leaked into earlier/self logits",
        )
        # and the perturbation must actually reach *some* later position
        if p < h * w - 1:
            assert not np.allclose(out[p + 1:], base[p + 1:]), (
                f"perturbation at {p} had no downstream effect — dead model?"
            )


def test_pixelsnail_conditional_bottom():
    """Bottom prior: conditioned on top codes; cached condition features must
    reproduce the direct path (reference cache semantics, pixelsnail.py:410-424)."""
    model = PixelSNAIL(
        shape=(8, 8), n_class=8, channel=16, kernel_size=5, n_block=1,
        n_res_block=1, res_channel=16, attention=False, dropout=0.0,
        n_cond_res_block=1, cond_res_channel=16,
    )
    rng = np.random.default_rng(1)
    bottom = jnp.asarray(rng.integers(0, 8, size=(2, 8, 8)), jnp.int32)
    top = jnp.asarray(rng.integers(0, 8, size=(2, 4, 4)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), bottom, condition=top)

    direct = model.apply(variables, bottom, condition=top)
    assert direct.shape == (2, 8, 8, 8)

    cond_feat = model.apply(variables, top, method=model.compute_condition)
    assert cond_feat.shape == (2, 8, 8, 16)
    cached = model.apply(variables, bottom, condition_features=cond_feat)
    np.testing.assert_allclose(
        np.asarray(direct), np.asarray(cached), rtol=1e-5, atol=1e-6
    )

    # condition must influence output
    top2 = (top + 3) % 8
    other = model.apply(variables, bottom, condition=top2)
    assert not np.allclose(np.asarray(direct), np.asarray(other))


def test_pixelsnail_condition_is_not_causally_masked():
    """The condition is the *top* hierarchy — every bottom position may see all
    of it (only the bottom codes are causally masked)."""
    model = PixelSNAIL(
        shape=(4, 4), n_class=8, channel=16, kernel_size=5, n_block=1,
        n_res_block=1, res_channel=16, attention=False, dropout=0.0,
        n_cond_res_block=1, cond_res_channel=16,
    )
    rng = np.random.default_rng(2)
    bottom = jnp.asarray(rng.integers(0, 8, size=(1, 4, 4)), jnp.int32)
    top = jnp.asarray(rng.integers(0, 8, size=(1, 2, 2)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), bottom, condition=top)
    base = model.apply(variables, bottom, condition=top)
    top_pert = top.at[0, 1, 1].set((top[0, 1, 1] + 1) % 8)
    out = model.apply(variables, bottom, condition=top_pert)
    # even the first bottom position's logits may change
    assert not np.allclose(np.asarray(base), np.asarray(out))


def test_pixelsnail_train_mode_dropout():
    model = tiny_top()
    codes = jnp.zeros((1, 6, 6), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), codes)
    model_do = tiny_top()
    # dropout>0 requires rng and differs across keys
    m = PixelSNAIL(shape=(6, 6), n_class=8, channel=16, kernel_size=5,
                   n_block=1, n_res_block=1, res_channel=16, dropout=0.5)
    v = m.init(jax.random.PRNGKey(0), codes)
    o1 = m.apply(v, codes, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    o2 = m.apply(v, codes, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
    # eval mode deterministic
    e1 = m.apply(v, codes)
    e2 = m.apply(v, codes)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
