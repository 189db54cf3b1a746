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
        # explicit (1,1) pad = torch Conv2d(padding=1); "SAME" would pad
        # (0,1) on even inputs under stride 2, misaligning pretrained weights
        h = nn.Conv(self.features, (3, 3), strides=self.strides,
                    padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="conv2")(h)
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
        h = nn.Conv(self.features, (3, 3), strides=self.strides,
                    padding=[(1, 1), (1, 1)],
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


def _torchvision_arrays(sd) -> dict:
    """torch ``state_dict`` (or checkpoint wrapping one) → {resnet key: np}.

    Strips ``module.`` wrappers and any common prefix in front of the
    canonical torchvision naming (``conv1.weight``, ``layer2.0.conv1.weight``,
    …) so checkpoints saved from wrapped models (DDP, ``backbone.body.`` of
    torchvision detection models) import too.
    """
    import numpy as np

    for key in ("state_dict", "model", "net"):
        if isinstance(sd, dict) and key in sd and isinstance(sd[key], dict):
            sd = sd[key]
    arrays = {}
    for k, v in sd.items():
        arrays[k[7:] if k.startswith("module.") else k] = (
            v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
    if "conv1.weight" not in arrays:
        tails = [k for k in arrays if k.endswith("conv1.weight")
                 and ".layer" not in k]
        if tails:
            prefix = tails[0][: -len("conv1.weight")]
            arrays = {k[len(prefix):]: v for k, v in arrays.items()
                      if k.startswith(prefix)}
    return arrays


def import_torchvision_resnet(variables, state_dict):
    """Fill every ResNet stem/trunk found in ``variables`` from a torchvision
    ``state_dict`` — the TPU analogue of the reference's pretrained-backbone
    surgery (``fashion.py:112-123`` keeps the pretrained torchvision body and
    swaps the heads; ``model.py:79-90`` deep-copies one pretrained base into
    each modality stem, ``model.py:117-123``).

    Walks the variables tree: any node holding ``conv1``+``bn1``+``layer1_0``
    is a stem (filled from ``conv1``/``bn1``); any ``layer{L}_{i}`` child with
    block structure is filled from ``layer{L}.{i}``.  Multiple stems (the
    ReID modality stems) all receive the same pretrained weights, exactly as
    the reference's deep copies do.  Conv kernels transpose OIHW→HWIO; copies
    are shape-checked.  Returns ``(variables, n_tensors_copied)``.
    """
    import re

    import numpy as np

    sd = (_torchvision_arrays(state_dict) if not isinstance(state_dict, str)
          else None)
    if sd is None:
        import torch

        sd = _torchvision_arrays(torch.load(state_dict, map_location="cpu"))

    out = jax.tree_util.tree_map(lambda x: x, variables)  # deep container copy
    params = out.get("params", out)
    stats = out.get("batch_stats", {})
    copied = [0]
    block_re = re.compile(r"^layer([1-4])_(\d+)$")

    def put(dst, leaf, src_key, transpose=False):
        if src_key not in sd:
            return
        v = sd[src_key]
        if transpose:
            v = v.transpose(2, 3, 1, 0)  # OIHW → HWIO
        if leaf not in dst or tuple(dst[leaf].shape) != tuple(v.shape):
            raise ValueError(
                f"shape mismatch importing {src_key}: model "
                f"{tuple(dst[leaf].shape) if leaf in dst else None} vs "
                f"checkpoint {tuple(v.shape)} — wrong arch?")
        dst[leaf] = jnp.asarray(np.ascontiguousarray(v))
        copied[0] += 1

    def copy_bn(pnode, snode, dst, src):
        put(pnode[dst], "scale", f"{src}.weight")
        put(pnode[dst], "bias", f"{src}.bias")
        if isinstance(snode, dict) and dst in snode:
            put(snode[dst], "mean", f"{src}.running_mean")
            put(snode[dst], "var", f"{src}.running_var")

    def copy_block(pnode, snode, src):
        for j in ("1", "2", "3"):
            if f"conv{j}" in pnode and f"{src}.conv{j}.weight" in sd:
                put(pnode[f"conv{j}"], "kernel", f"{src}.conv{j}.weight",
                    transpose=True)
                copy_bn(pnode, snode, f"bn{j}", f"{src}.bn{j}")
        if "ds_conv" in pnode and f"{src}.downsample.0.weight" in sd:
            put(pnode["ds_conv"], "kernel", f"{src}.downsample.0.weight",
                transpose=True)
            copy_bn(pnode, snode, "ds_bn", f"{src}.downsample.1")

    def walk(pnode, snode):
        if not isinstance(pnode, dict):
            return
        if "conv1" in pnode and "bn1" in pnode and "layer1_0" in pnode:
            put(pnode["conv1"], "kernel", "conv1.weight", transpose=True)
            copy_bn(pnode, snode, "bn1", "bn1")
        for k, child in pnode.items():
            if not isinstance(child, dict):
                continue
            m = block_re.match(k)
            schild = snode.get(k, {}) if isinstance(snode, dict) else {}
            if m and "conv1" in child and "kernel" in child.get("conv1", {}):
                copy_block(child, schild, f"layer{m.group(1)}.{m.group(2)}")
            else:
                walk(child, schild)

    walk(params, stats)
    if copied[0] == 0:
        raise ValueError("no ResNet stem/trunk pattern found in variables — "
                         "nothing imported")
    return out, copied[0]


def load_torchvision_weights(variables, state_dict_path: str, arch: str = ""):
    """Back-compat wrapper: import a torchvision resnet ``.pt`` file into
    ``variables`` (see :func:`import_torchvision_resnet`)."""
    out, _ = import_torchvision_resnet(variables, state_dict_path)
    return out
