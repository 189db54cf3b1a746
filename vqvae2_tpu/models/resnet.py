"""ResNet backbone (18/34/50) for the ReID nets — JAX-native replacement for
the torchvision backbones the reference loads pretrained
(reference ``model.py:79-90``).

Split into :class:`ResNetStem` (conv1 → bn → maxpool → layer1) and
:class:`ResNetTrunk` (layer2-4) because the ReID nets instantiate one stem per
modality (thermal/visible/z deep-copies, ``model.py:117-123``) over a shared
trunk.  Supports the reference's last-stride-1 surgery on layer4
(``model.py:81-90``): stride 1 in the first layer4 block and its downsample.

No pretrained download exists in this zero-egress image; weights initialize
He-normal, and :func:`load_torchvision_weights` converts a local torchvision
``state_dict`` file when one is provided.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

CONFIGS = {
    "resnet18": {"block": "basic", "layers": (2, 2, 2, 2), "width": 512},
    "resnet34": {"block": "basic", "layers": (3, 4, 6, 3), "width": 512},
    "resnet50": {"block": "bottleneck", "layers": (3, 4, 6, 3), "width": 2048},
}


class BasicBlock(nn.Module):
    features: int
    strides: Tuple[int, int] = (1, 1)
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        residual = x
        h = nn.Conv(self.features, (3, 3), strides=self.strides, padding="SAME",
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, name="bn2")(h)
        if self.downsample:
            residual = nn.Conv(self.features, (1, 1), strides=self.strides,
                               use_bias=False, dtype=self.dtype,
                               name="ds_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train,
                                    name="ds_bn")(residual)
        return nn.relu(h + residual)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output = 4*features
    strides: Tuple[int, int] = (1, 1)
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        residual = x
        h = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, name="bn1")(h)
        h = nn.relu(h)
        # torchvision places the stride on conv2 (ResNet-B); the reference's
        # last-stride surgery zeroes exactly this stride (model.py:81-82)
        h = nn.Conv(self.features, (3, 3), strides=self.strides, padding="SAME",
                    use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, name="bn2")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(h)
        h = nn.BatchNorm(use_running_average=not train, name="bn3")(h)
        if self.downsample:
            residual = nn.Conv(self.features * 4, (1, 1), strides=self.strides,
                               use_bias=False, dtype=self.dtype,
                               name="ds_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train,
                                    name="ds_bn")(residual)
        return nn.relu(h + residual)


def _make_layer(block_type: str, features: int, n_blocks: int, stride: int,
                in_features: int, dtype, name_prefix: str) -> List[nn.Module]:
    Block = BasicBlock if block_type == "basic" else Bottleneck
    out_features = features * (1 if block_type == "basic" else 4)
    blocks = []
    need_ds = stride != 1 or in_features != out_features
    blocks.append(Block(features, strides=(stride, stride), downsample=need_ds,
                        dtype=dtype, name=f"{name_prefix}_0"))
    for i in range(1, n_blocks):
        blocks.append(Block(features, dtype=dtype, name=f"{name_prefix}_{i}"))
    return blocks


class ResNetStem(nn.Module):
    """conv1 + bn1 + maxpool + layer1 (NO relu after bn — the reference's
    modality stems deliberately omit it, model.py:117-119)."""

    arch: str = "resnet50"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        cfg = CONFIGS[self.arch]
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, name="bn1")(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        in_f = 64
        for blk in _make_layer(cfg["block"], 64, cfg["layers"][0], 1, in_f,
                               self.dtype, "layer1"):
            h = blk(h, train=train)
        return h


class ResNetTrunk(nn.Module):
    """layer2-4 (reference ``base_resnet``, model.py:92-98), with last-stride-1
    surgery on layer4 when ``last_stride_1`` (model.py:81-90).

    ``__call__`` returns ``(x3, x4)`` — layer3 and layer4 features, the pair
    the ReID forward consumes (model.py:156-157)."""

    arch: str = "resnet50"
    last_stride_1: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> Tuple[jax.Array, jax.Array]:
        cfg = CONFIGS[self.arch]
        expansion = 1 if cfg["block"] == "basic" else 4
        h = x
        in_f = 64 * expansion
        for blk in _make_layer(cfg["block"], 128, cfg["layers"][1], 2, in_f,
                               self.dtype, "layer2"):
            h = blk(h, train=train)
        for blk in _make_layer(cfg["block"], 256, cfg["layers"][2], 2,
                               128 * expansion, self.dtype, "layer3"):
            h = blk(h, train=train)
        x3 = h
        stride4 = 1 if self.last_stride_1 else 2
        for blk in _make_layer(cfg["block"], 512, cfg["layers"][3], stride4,
                               256 * expansion, self.dtype, "layer4"):
            h = blk(h, train=train)
        return x3, h


def pool_dim(arch: str) -> int:
    return CONFIGS[arch]["width"]


def load_torchvision_weights(variables, state_dict_path: str, arch: str):
    """Convert a locally-available torchvision ``state_dict`` (``.pt`` readable
    by ``torch.load``) into this module's variables.  Best-effort mapping of
    conv/bn tensors (OIHW→HWIO); raises if the file is absent."""
    import torch

    sd = torch.load(state_dict_path, map_location="cpu")
    out = jax.tree_util.tree_map(lambda x: x, variables)  # shallow copy

    def conv_w(name):
        return jnp.asarray(sd[name].numpy().transpose(2, 3, 1, 0))

    def put(tree, path, val):
        node = tree
        for k in path[:-1]:
            node = node[k]
        node[path[-1]] = val

    import flax
    params = flax.core.unfreeze(out["params"])
    stats = flax.core.unfreeze(out.get("batch_stats", {}))

    def copy_bn(dst_prefix, src_prefix):
        put(params, dst_prefix + ["scale"], jnp.asarray(sd[src_prefix + ".weight"].numpy()))
        put(params, dst_prefix + ["bias"], jnp.asarray(sd[src_prefix + ".bias"].numpy()))
        put(stats, dst_prefix + ["mean"], jnp.asarray(sd[src_prefix + ".running_mean"].numpy()))
        put(stats, dst_prefix + ["var"], jnp.asarray(sd[src_prefix + ".running_var"].numpy()))

    # stem
    put(params, ["conv1", "kernel"], conv_w("conv1.weight"))
    copy_bn(["bn1"], "bn1")
    # layers are mapped by enumeration: layer{L}_{i} ↔ layer{L}.{i}
    for l in range(1, 5):
        i = 0
        while f"layer{l}.{i}.conv1.weight" in sd:
            dst = f"layer{l}_{i}"
            if dst not in params:
                break
            blk = params[dst]
            for cname in ("conv1", "conv2", "conv3"):
                if f"layer{l}.{i}.{cname}.weight" in sd and cname in blk:
                    put(params, [dst, cname, "kernel"], conv_w(f"layer{l}.{i}.{cname}.weight"))
                    copy_bn([dst, f"bn{cname[-1]}"], f"layer{l}.{i}.bn{cname[-1]}")
            if f"layer{l}.{i}.downsample.0.weight" in sd and "ds_conv" in blk:
                put(params, [dst, "ds_conv", "kernel"], conv_w(f"layer{l}.{i}.downsample.0.weight"))
                copy_bn([dst, "ds_bn"], f"layer{l}.{i}.downsample.1")
            i += 1

    out = dict(out)
    out["params"] = flax.core.freeze(params) if isinstance(variables.get("params"), flax.core.FrozenDict) else params
    if stats:
        out["batch_stats"] = stats
    return out
