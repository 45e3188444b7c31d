"""Feature Pyramid Network (torchvision-compatible topology) in flax/NHWC.

Reference: the detector builds ``resnet_fpn_backbone('resnet34',
returned_layers=[2,3,4])`` (fcos_utils/fcos.py:476) — lateral 1x1 convs +
top-down nearest-neighbor upsampling + 3x3 output convs, 256 channels, plus a
LastLevelMaxPool the reference then discards (fcos.py:742). We simply don't
build the extra level.
"""

from __future__ import annotations

from typing import Any, List, Sequence

import flax.linen as nn
import jax.numpy as jnp

from handnet_tpu.nn.quant import conv_layer


def _upsample_nearest_2x(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Nearest upsample to an exact target size (handles odd feature maps).

    torchvision FPN uses ``F.interpolate(size=..., mode='nearest')``; the
    matching gather is ``src = floor(dst * in/out)``.
    """
    h, w = x.shape[-3], x.shape[-2]
    ys = (jnp.arange(out_h) * h) // out_h
    xs = (jnp.arange(out_w) * w) // out_w
    return x[..., ys[:, None], xs[None, :], :]


class FPN(nn.Module):
    out_channels: int = 256
    dtype: Any = jnp.float32
    quant: bool = False  # dynamic-int8 convs (nn/quant.py)

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
        """features: bottom-up maps ordered fine->coarse (e.g. [c3, c4, c5])."""
        laterals = [
            conv_layer(self.quant, self.out_channels, (1, 1), dtype=self.dtype,
                       name=f"lateral_{i}")(f)
            for i, f in enumerate(features)
        ]
        # top-down pathway
        out = [laterals[-1]]
        for i in range(len(laterals) - 2, -1, -1):
            up = _upsample_nearest_2x(out[0], laterals[i].shape[-3],
                                      laterals[i].shape[-2])
            out.insert(0, laterals[i] + up)
        return [
            conv_layer(self.quant, self.out_channels, (3, 3), padding=1,
                       dtype=self.dtype, name=f"output_{i}")(o)
            for i, o in enumerate(out)
        ]
