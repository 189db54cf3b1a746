"""Pretrained-backbone import: torchvision-named state_dict → flax ResNet.

The torch oracle below reproduces this repo's stem/trunk semantics (no relu
after bn1 — reference model.py:117-119 — and last-stride-1 layer4) with exact
torchvision parameter naming, so a random-init torch net is a full numerical
oracle for :func:`vqvae2_tpu.models.resnet.import_torchvision_resnet`
(the reference's pretrained surgery, fashion.py:112-123 / model.py:79-123).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from vqvae2_tpu.models.resnet import (ResNetStem, ResNetTrunk,
                                      import_torchvision_resnet)

torch = pytest.importorskip("torch")
tnn = torch.nn


def _conv3(i, o, s=1):
    return tnn.Conv2d(i, o, 3, s, 1, bias=False)


class _TorchBasic(tnn.Module):
    def __init__(self, i, o, s=1):
        super().__init__()
        self.conv1 = _conv3(i, o, s)
        self.bn1 = tnn.BatchNorm2d(o)
        self.conv2 = _conv3(o, o)
        self.bn2 = tnn.BatchNorm2d(o)
        self.downsample = None
        if s != 1 or i != o:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(i, o, 1, s, bias=False), tnn.BatchNorm2d(o))

    def forward(self, x):
        r = x
        h = torch.relu(self.bn1(self.conv1(x)))
        h = self.bn2(self.conv2(h))
        if self.downsample is not None:
            r = self.downsample(x)
        return torch.relu(h + r)


class _TorchNet(tnn.Module):
    """resnet18 layout, torchvision naming, this repo's forward semantics."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = tnn.Sequential(_TorchBasic(64, 64), _TorchBasic(64, 64))
        self.layer2 = tnn.Sequential(_TorchBasic(64, 128, 2),
                                     _TorchBasic(128, 128))
        self.layer3 = tnn.Sequential(_TorchBasic(128, 256, 2),
                                     _TorchBasic(256, 256))
        # last-stride-1 surgery (reference model.py:81-90)
        self.layer4 = tnn.Sequential(_TorchBasic(256, 512, 1),
                                     _TorchBasic(512, 512))

    def forward(self, x):
        h = self.bn1(self.conv1(x))  # deliberately no relu (stem semantics)
        h = self.maxpool(h)
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            h = layer(h)
        return h


class _FlaxNet(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        h = ResNetStem("resnet18", name="stem")(x, train=train)
        _, x4 = ResNetTrunk("resnet18", last_stride_1=True,
                            name="trunk")(h, train=train)
        return x4


def _random_torch_net(seed=0):
    torch.manual_seed(seed)
    net = _TorchNet().eval()
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.5, 0.5)
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    return net


def test_import_matches_torch_oracle():
    net = _random_torch_net()
    model = _FlaxNet()
    x = np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(np.float32)
    variables = dict(model.init(jax.random.PRNGKey(0), jnp.asarray(x)))

    filled, n = import_torchvision_resnet(variables, net.state_dict())
    # resnet18: 20 convs + 20 BNs × 4 tensors = 100 tensors
    assert n == 100, n

    out = model.apply(filled, jnp.asarray(x))
    with torch.no_grad():
        ref = net(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-4)


def test_import_strips_prefixes_and_wrappers():
    net = _random_torch_net(1)
    model = _FlaxNet()
    variables = dict(model.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 32, 32, 3))))
    sd = {f"module.backbone.body.{k}": v for k, v in net.state_dict().items()}
    filled, n = import_torchvision_resnet(variables, {"state_dict": sd})
    assert n == 100
    got = np.asarray(filled["params"]["stem"]["conv1"]["kernel"])
    want = net.state_dict()["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want)


def test_import_fills_every_stem():
    """Multiple modality stems all receive the same pretrained base, like the
    reference's deep copies (model.py:117-123)."""

    class _TwoStems(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            a = ResNetStem("resnet18", name="visible")(x, train=train)
            b = ResNetStem("resnet18", name="thermal")(x, train=train)
            return a + b

    net = _random_torch_net(2)
    model = _TwoStems()
    variables = dict(model.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 32, 32, 3))))
    filled, n = import_torchvision_resnet(variables, net.state_dict())
    # stem = conv1 + bn1 + layer1 (4 convs + 4 BNs): 5 convs, 5 BNs → 25
    assert n == 50, n
    va = filled["params"]["visible"]["conv1"]["kernel"]
    vb = filled["params"]["thermal"]["conv1"]["kernel"]
    np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    # untouched heads keep their init — layer2 absent here, nothing to check;
    # batch_stats must be filled too
    np.testing.assert_allclose(
        np.asarray(filled["batch_stats"]["visible"]["bn1"]["mean"]),
        net.bn1.running_mean.numpy())


def test_import_shape_mismatch_raises():
    net = _random_torch_net(3)

    class _Wrong(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return ResNetStem("resnet50", name="stem")(x, train=train)

    variables = dict(_Wrong().init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 32, 32, 3))))
    with pytest.raises(ValueError, match="shape mismatch|wrong arch"):
        import_torchvision_resnet(variables, net.state_dict())
