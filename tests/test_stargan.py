"""StarGAN-v2 model tests: generator hourglass geometry, style conditioning,
mapping/style-encoder domain selection, discriminator output."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae2_tpu.models.stargan import (
    DiscriminatorV2,
    Generator,
    MappingNetwork,
    ResBlk,
    StyleEncoder,
    high_pass,
)


def test_resblk_sqrt2(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32)
    m = ResBlk(dim_out=32, normalize=True, downsample=True)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (2, 4, 4, 32)


@pytest.mark.slow
def test_generator_geometry(rng):
    g = Generator(img_size=64, style_dim=32, w_hpf=0, out_channel=1)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    s = jnp.asarray(rng.normal(size=(2, 32)), jnp.float32)
    v = g.init(jax.random.PRNGKey(0), x, s)
    y = g.apply(v, x, s)
    assert y.shape == (2, 64, 64, 1)
    # style matters
    y2 = g.apply(v, x, s * 3.0)
    assert not np.allclose(np.asarray(y), np.asarray(y2))


@pytest.mark.slow
def test_generator_hpf_masks(rng):
    g = Generator(img_size=64, style_dim=32, w_hpf=1, out_channel=1)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    s = jnp.asarray(rng.normal(size=(1, 32)), jnp.float32)
    masks = (jnp.ones((1, 16, 16, 1)), jnp.ones((1, 32, 32, 1)))
    v = g.init(jax.random.PRNGKey(0), x, s, masks)
    y = g.apply(v, x, s, masks)
    assert y.shape == (1, 64, 64, 1)
    y0 = g.apply(v, x, s, None)
    assert not np.allclose(np.asarray(y), np.asarray(y0))


def test_high_pass_flat_input_is_zero():
    x = jnp.ones((1, 8, 8, 4))
    out = high_pass(x, 1.0)
    # interior of a constant image has zero high-frequency response
    np.testing.assert_allclose(np.asarray(out[:, 1:-1, 1:-1]), 0.0, atol=1e-5)


def test_mapping_and_style_encoder_domains(rng):
    mn = MappingNetwork(style_dim=16, num_domains=2)
    z = jnp.asarray(rng.normal(size=(4, 32)), jnp.float32)
    v = mn.init(jax.random.PRNGKey(0), z, jnp.zeros((4,), jnp.int32))
    s0 = mn.apply(v, z, jnp.zeros((4,), jnp.int32))
    s1 = mn.apply(v, z, jnp.ones((4,), jnp.int32))
    assert s0.shape == (4, 16)
    assert not np.allclose(np.asarray(s0), np.asarray(s1))

    se = StyleEncoder(img_size=64, style_dim=16, num_domains=2)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    v = se.init(jax.random.PRNGKey(0), x, jnp.zeros((2,), jnp.int32))
    e0 = se.apply(v, x, jnp.zeros((2,), jnp.int32))
    e1 = se.apply(v, x, jnp.ones((2,), jnp.int32))
    assert e0.shape == (2, 16)
    assert not np.allclose(np.asarray(e0), np.asarray(e1))


@pytest.mark.slow
def test_discriminator_and_r1_grad(rng):
    d = DiscriminatorV2(img_size=64, num_domains=2)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 1)), jnp.float32)
    x = jnp.repeat(x, 3, axis=-1)
    y = jnp.zeros((2,), jnp.int32)
    v = d.init(jax.random.PRNGKey(0), x, y)
    out = d.apply(v, x, y)
    assert out.shape == (2,)

    # R1 penalty needs grad-of-output w.r.t. input (train_vqvae_deep_bi2's
    # r1_reg): must be computable
    def dsum(x):
        return jnp.sum(d.apply(v, x, y))

    g = jax.grad(dsum)(x)
    assert g.shape == x.shape and bool(jnp.all(jnp.isfinite(g)))


def test_generator_rejects_indivisible_geometry(rng):
    # 5 stride-2 stages (img_size=256, w_hpf=1) cannot invert W=144:
    # SAME floors 9 -> 4 going down and comes back as 128. Must fail loudly.
    g = Generator(img_size=256, style_dim=32, w_hpf=1, out_channel=1)
    x = jnp.zeros((1, 288, 144, 3), jnp.float32)
    s = jnp.zeros((1, 32), jnp.float32)
    with pytest.raises(ValueError, match="divisible by 32"):
        g.init(jax.random.PRNGKey(0), x, s)


def test_trainer_img_size_divides_geometry():
    from vqvae2_tpu.train.stargan_bi import _generator_img_size

    # SYSU geometry: the reference hardcodes Generator(256//2)
    assert _generator_img_size(288, 144) == 128
    # power-of-two squares keep the reference-default size
    assert _generator_img_size(256, 256) == 256
    assert _generator_img_size(64, 64) == 64
    # every choice must satisfy the Generator's divisibility constraint
    for h, w in [(288, 144), (256, 128), (256, 256), (64, 64), (96, 48)]:
        size = _generator_img_size(h, w)
        div = 1 << (int(np.log2(size)) - 3)  # w_hpf=1 stage count
        assert h % div == 0 and w % div == 0, (h, w, size)
