"""ResNet backbones in flax/NHWC, designed for the TPU MXU.

Covers both reference backbones:
* A2J's ResNet-50 with **layer4 stride 1 / dilation 2** so stages 3 and 4 share
  stride 16 (reference a2j/resnet.py:99-218, dilation at :112).
* FCOS's torchvision ResNet-34 feeding the FPN (reference fcos_utils/fcos.py:476).

Design notes (TPU-first):
* NHWC layout — XLA's native conv layout on TPU; channels-last keeps the
  128-lane dimension dense.
* BatchNorm carries running statistics in a separate ``batch_stats`` collection;
  ``train=False`` uses them (inference graphs fold BN into the conv).
* ``norm="frozen"`` turns BN into a pure affine op (torchvision's
  FrozenBatchNorm2d used by the detector backbone).
* Compute dtype is configurable (bf16 by default in the pipeline); parameters
  stay fp32.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

ModuleDef = Any


class FrozenBatchNorm(nn.Module):
    """BatchNorm with fixed statistics — an affine transform (scale + shift).

    Equivalent to torchvision FrozenBatchNorm2d; statistics live in
    ``batch_stats`` so converted torch weights slot in unchanged.
    """

    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((features,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((features,), jnp.float32))
        mul = (scale / jnp.sqrt(var.value + self.epsilon)).astype(self.dtype)
        add = (bias - mean.value * scale / jnp.sqrt(var.value + self.epsilon)).astype(self.dtype)
        return x * mul + add


def make_norm(norm: str, dtype: Any) -> Callable[..., nn.Module]:
    if norm == "batch":
        return partial(nn.BatchNorm, momentum=0.9, epsilon=1e-5, dtype=dtype,
                       param_dtype=jnp.float32, axis_name=None)
    if norm == "batch_sync":
        # cross-replica stat sync over the data-parallel mesh axis
        return partial(nn.BatchNorm, momentum=0.9, epsilon=1e-5, dtype=dtype,
                       param_dtype=jnp.float32, axis_name="data")
    if norm == "frozen":
        return partial(FrozenBatchNorm, dtype=dtype)
    if norm == "group":
        return partial(nn.GroupNorm, num_groups=32, dtype=dtype,
                       param_dtype=jnp.float32)
    raise ValueError(f"unknown norm {norm!r}")


def _call_norm(norm_layer: nn.Module, x, train: bool):
    if isinstance(norm_layer, nn.GroupNorm):
        return norm_layer(x)
    return norm_layer(x, use_running_average=not train)


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dilation: int = 1
    norm: Callable[..., nn.Module] = nn.BatchNorm
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=self.strides,
                    padding=self.dilation, kernel_dilation=self.dilation,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = _call_norm(self.norm(name="bn1"), y, train)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=self.dilation,
                    kernel_dilation=self.dilation, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = _call_norm(self.norm(name="bn2"), y, train)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1), strides=self.strides,
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = _call_norm(self.norm(name="downsample_bn"), residual, train)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output channels = 4 * features
    strides: int = 1
    dilation: int = 1
    norm: Callable[..., nn.Module] = nn.BatchNorm
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = _call_norm(self.norm(name="bn1"), y, train)
        y = nn.relu(y)
        # stride on the 3x3 (torchvision v1.5+ "stride-on-3x3" convention,
        # matching a2j/resnet.py:40-52)
        y = nn.Conv(self.features, (3, 3), strides=self.strides,
                    padding=self.dilation, kernel_dilation=self.dilation,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = _call_norm(self.norm(name="bn2"), y, train)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = _call_norm(self.norm(name="bn3"), y, train)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features * 4, (1, 1), strides=self.strides,
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = _call_norm(self.norm(name="downsample_bn"), residual, train)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Generic ResNet trunk returning the pyramid {c1..c5} as a dict.

    ``stage_strides``/``stage_dilations`` let A2J set layer4 stride=1 dilation=2
    (reference a2j/resnet.py:112 via ``replace_stride_with_dilation``).
    """

    stage_sizes: Sequence[int]
    block: ModuleDef
    width: int = 64
    stage_strides: Tuple[int, int, int, int] = (1, 2, 2, 2)
    stage_dilations: Tuple[int, int, int, int] = (1, 1, 1, 1)
    norm: str = "batch"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        norm = make_norm(self.norm, self.dtype)
        x = x.astype(self.dtype)
        x = nn.Conv(self.width, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = _call_norm(norm(name="bn1"), x, train)
        x = nn.relu(x)
        feats = {"c1": x}
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, num_blocks in enumerate(self.stage_sizes):
            features = self.width * (2 ** i)
            for j in range(num_blocks):
                # the first block of a dilated stage keeps the PREVIOUS
                # stage's dilation — both a2j/resnet.py:133-145 (its
                # _make_layer passes no dilation to block 0) and
                # torchvision's previous_dilation convention do this
                dilation = (self.stage_dilations[i] if j > 0
                            else self.stage_dilations[i - 1] if i > 0 else 1)
                x = self.block(
                    features=features,
                    strides=self.stage_strides[i] if j == 0 else 1,
                    dilation=dilation,
                    norm=norm,
                    dtype=self.dtype,
                    name=f"layer{i + 1}_{j}",
                )(x, train=train)
            feats[f"c{i + 2}"] = x
        return feats


def resnet18(norm: str = "batch", dtype: Any = jnp.float32, **kw) -> ResNet:
    return ResNet(stage_sizes=(2, 2, 2, 2), block=BasicBlock, norm=norm,
                  dtype=dtype, **kw)


def resnet34(norm: str = "batch", dtype: Any = jnp.float32, **kw) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), block=BasicBlock, norm=norm,
                  dtype=dtype, **kw)


def resnet50(norm: str = "batch", dtype: Any = jnp.float32, **kw) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), block=Bottleneck, norm=norm,
                  dtype=dtype, **kw)


def resnet50_dilated(norm: str = "batch", dtype: Any = jnp.float32,
                     **kw) -> ResNet:
    """A2J's backbone: layer4 stride 1, dilation 2 (a2j/resnet.py:112)."""
    return resnet50(norm=norm, dtype=dtype,
                    stage_strides=(1, 2, 2, 1), stage_dilations=(1, 1, 1, 2),
                    **kw)
