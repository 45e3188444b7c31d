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
import jax
import jax.numpy as jnp

from handnet_tpu.nn.quant import conv_layer

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
    quant: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = conv_layer(self.quant, self.features, (3, 3), strides=self.strides,
                       padding=self.dilation, kernel_dilation=self.dilation,
                       use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = _call_norm(self.norm(name="bn1"), y, train)
        y = nn.relu(y)
        y = conv_layer(self.quant, self.features, (3, 3), padding=self.dilation,
                       kernel_dilation=self.dilation, use_bias=False,
                       dtype=self.dtype, name="conv2")(y)
        y = _call_norm(self.norm(name="bn2"), y, train)
        if residual.shape != y.shape:
            residual = conv_layer(self.quant, self.features, (1, 1),
                                  strides=self.strides,
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
    quant: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = conv_layer(self.quant, self.features, (1, 1), use_bias=False,
                       dtype=self.dtype, name="conv1")(x)
        y = _call_norm(self.norm(name="bn1"), y, train)
        y = nn.relu(y)
        # stride on the 3x3 (torchvision v1.5+ "stride-on-3x3" convention,
        # matching a2j/resnet.py:40-52)
        y = conv_layer(self.quant, self.features, (3, 3), strides=self.strides,
                       padding=self.dilation, kernel_dilation=self.dilation,
                       use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = _call_norm(self.norm(name="bn2"), y, train)
        y = nn.relu(y)
        y = conv_layer(self.quant, self.features * 4, (1, 1), use_bias=False,
                       dtype=self.dtype, name="conv3")(y)
        y = _call_norm(self.norm(name="bn3"), y, train)
        if residual.shape != y.shape:
            residual = conv_layer(self.quant, self.features * 4, (1, 1),
                                  strides=self.strides,
                                  use_bias=False, dtype=self.dtype,
                                  name="downsample_conv")(x)
            residual = _call_norm(self.norm(name="downsample_bn"), residual, train)
        return nn.relu(y + residual)


class StemConv(nn.Module):
    """The 7x7/stride-2 resnet stem, optionally computed via space-to-depth.

    The plain 7x7 s2 conv on 3 channels runs far below MXU peak (tiny input
    channel count, strided access). The classic TPU transform (MLPerf
    resnet): 2x2 space-to-depth the input ([H,W,3] -> [H/2,W/2,12]) and run
    a stride-1 4x4 conv whose kernel is the original 7x7 zero-padded to 8x8
    and re-blocked — MATHEMATICALLY IDENTICAL outputs (asserted by
    tests/test_ops_misc.py::test_s2d_stem_equivalence), same parameter
    ("kernel", [7,7,in,width]) so checkpoints/converters are unaffected.
    Requires even H,W; falls back to the plain conv otherwise.
    """

    width: int
    dtype: Any = jnp.float32
    s2d: bool = False

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, in_ch, self.width))
        kernel = kernel.astype(self.dtype)
        b, h, w, _ = x.shape
        dn = ("NHWC", "HWIO", "NHWC")
        if not self.s2d or h % 2 or w % 2:
            return jax.lax.conv_general_dilated(
                x, kernel, (2, 2), ((3, 3), (3, 3)), dimension_numbers=dn)
        # out[i] = sum_{d=0..7} k8[d] x[2i+d-4] with k8 = left/top-zero-padded
        # kernel; grouping d = 2t+r maps onto 4 taps over 2x2 pixel blocks
        k8 = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        k8 = k8.reshape(4, 2, 4, 2, in_ch, self.width)
        k8 = k8.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * in_ch,
                                                    self.width)
        xs = x.reshape(b, h // 2, 2, w // 2, 2, in_ch)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2,
                                                    4 * in_ch)
        return jax.lax.conv_general_dilated(
            xs, k8, (1, 1), ((2, 1), (2, 1)), dimension_numbers=dn)


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
    s2d_stem: bool = False
    # dynamic-int8 conv path for the residual blocks (nn/quant.py). The stem
    # stays float: 3 input channels carry ~0.5% of the FLOPs and the first
    # layer is the most quantization-sensitive.
    quant: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        norm = make_norm(self.norm, self.dtype)
        x = x.astype(self.dtype)
        x = StemConv(self.width, dtype=self.dtype, s2d=self.s2d_stem,
                     name="conv1")(x)
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
                    quant=self.quant,
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
