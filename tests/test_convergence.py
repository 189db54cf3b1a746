"""Learning evidence: overfit suites that assert losses actually FALL.

One-step-finite tests prove the graphs compile; these prove the gradients
point downhill — a sign-flipped gradient passes every finiteness test in the
repo but fails these.  The reference's equivalent evidence is its trained
artifacts (560-epoch FFHQ checkpoint + training reconstructions,
``/root/reference/README.md:16,38-44``); the TPU counterpart of that is
``scripts/convergence_run.sh`` (committed curves + grids under ``runs/``).

All runs overfit a tiny FIXED batch — the cheapest statement of "this
training loop can drive its loss to ~zero".
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vqvae2_tpu.data.shapes import render_shapes_image


def _shapes_batch(n, size):
    imgs = np.stack([render_shapes_image(i, size=size) for i in range(n)])
    return jnp.asarray(imgs.astype(np.float32) / 127.5 - 1.0)


@pytest.mark.slow
def test_vqvae_overfits_fixed_batch():
    """A small VQ-VAE must drive recon MSE on a fixed 8-image batch well
    below its init value (reference stage-1 objective, train_vqvae.py:34,85)."""
    from vqvae2_tpu.models.vqvae import VQVAE
    from vqvae2_tpu.train.vqvae import create_state, make_train_step

    # dead-code restart on: without it a tiny fixed batch collapses to ONE
    # live code for ~800 steps before recovering (measured) — the restart
    # keeps all 64 codes live and the overfit completes in 300 steps
    model = VQVAE(channel=32, n_res_block=1, n_res_channel=16,
                  embed_dim=16, n_embed=64, restart_threshold=0.03)
    tx = optax.adam(2e-3)
    state = create_state(model, tx, jax.random.PRNGKey(0), (1, 32, 32, 3))
    x = _shapes_batch(8, 32)
    step = make_train_step(model, tx).__wrapped__

    @functools.partial(jax.jit, static_argnames="n")
    def run(state, x, n):
        def body(s, _):
            s, m = step(s, x)
            return s, jnp.stack([m["loss"], m["recon_mse"]])
        return jax.lax.scan(body, state, None, length=n)

    state, ms = run(state, x, n=300)
    first_mse, last_mse = float(ms[0, 1]), float(ms[-1, 1])
    assert np.isfinite(last_mse)
    assert last_mse < 0.02, f"recon MSE did not overfit: {last_mse}"
    assert last_mse < 0.1 * first_mse, (first_mse, last_mse)


@pytest.mark.slow
def test_pixelsnail_overfits_tiny_codes():
    """The prior trainer must memorize 4 fixed 8x8 code grids: CE falls from
    ~ln(n_class) to near zero (reference stage-2 objective,
    train_pixelsnail.py:42-48)."""
    from vqvae2_tpu.models.pixelsnail import PixelSNAIL
    from vqvae2_tpu.train.pixelsnail import PriorState, make_train_step

    n_class = 16
    model = PixelSNAIL(shape=(8, 8), n_class=n_class, channel=64,
                       kernel_size=3, n_block=2, n_res_block=2,
                       res_channel=64, dropout=0.0)
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, n_class, size=(4, 8, 8)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 8, 8), jnp.int32))
    tx = optax.adam(1e-3)
    state = PriorState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       opt_state=tx.init(variables["params"]))
    step = make_train_step(model, tx, conditional=False).__wrapped__

    @functools.partial(jax.jit, static_argnames="n")
    def run(state, codes, n):
        def body(s, _):
            s, m = step(s, {"target": codes}, jax.random.PRNGKey(1))
            return s, jnp.stack([m["loss"], m["acc"]])
        return jax.lax.scan(body, state, None, length=n)

    state, ms = run(state, codes, n=250)
    first_ce, last_ce = float(ms[0, 0]), float(ms[-1, 0])
    last_acc = float(ms[-1, 1])
    assert abs(first_ce - np.log(n_class)) < 1.0, first_ce
    assert last_ce < 0.5, f"prior CE did not overfit: {first_ce}->{last_ce}"
    assert last_acc > 0.9, f"prior accuracy {last_acc}"


@pytest.mark.slow
def test_embed_net_learns_separable_identities():
    """The ReID loop must learn linearly-separable synthetic identities:
    after a few hundred id-loss steps, nearest-centroid accuracy on held-out
    noise draws of the same identities beats chance by a wide margin
    (reference train-and-validate loop, train_reid.py + reid_tools.py)."""
    from vqvae2_tpu.models.embed_net import EmbedNet

    n_ids, per_id, hw = 4, 4, (32, 16)
    rng = np.random.default_rng(0)
    # identity templates: distinct coarse color-block patterns + noise draws
    templates = rng.normal(size=(n_ids, *hw, 3)).astype(np.float32)

    def draw(batch_rng):
        labels = np.tile(np.arange(n_ids), per_id)
        x = templates[labels] + 0.3 * batch_rng.normal(
            size=(len(labels), *hw, 3)).astype(np.float32)
        return jnp.asarray(x), jnp.asarray(labels, jnp.int32)

    model = EmbedNet(class_num=n_ids, arch="resnet18")
    x0, y0 = draw(rng)
    variables = model.init(jax.random.PRNGKey(0), x0, modal=1, train=True)
    tx = optax.adam(1e-3)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    opt_state = tx.init(params)

    def loss_fn(params, batch_stats, x, y):
        (feat, logits), nv = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, modal=1,
            train=True, mutable=["batch_stats"])
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
        return ce, nv["batch_stats"]

    @jax.jit
    def train_step(params, batch_stats, opt_state, x, y):
        (ce, batch_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats, x, y)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), batch_stats, opt_state, ce

    first_ce = None
    for i in range(60):
        x, y = draw(rng)
        params, batch_stats, opt_state, ce = train_step(
            params, batch_stats, opt_state, x, y)
        if first_ce is None:
            first_ce = float(ce)
    last_ce = float(ce)
    assert last_ce < first_ce, (first_ce, last_ce)
    assert last_ce < 0.5 * first_ce, (first_ce, last_ce)

    # eval mode: L2-normed features; held-out draws must cluster by identity
    xq, yq = draw(np.random.default_rng(1))
    xg, yg = draw(np.random.default_rng(2))
    fq, _ = model.apply({"params": params, "batch_stats": batch_stats}, xq,
                        modal=1, train=False)
    fg, _ = model.apply({"params": params, "batch_stats": batch_stats}, xg,
                        modal=1, train=False)
    sim = np.asarray(fq) @ np.asarray(fg).T
    pred = np.asarray(yg)[sim.argmax(axis=1)]
    acc = float((pred == np.asarray(yq)).mean())
    assert acc > 0.6, f"retrieval accuracy {acc} barely beats chance (0.25)"
