"""MXU-friendly separable image resize.

``jax.image.resize(method='bilinear')`` lowers to gathers that run ~15x off
the HBM roofline on TPU — measured 28.6 ms/batch for the parity profile's
480x640 -> 800x1067 upscale at batch 128 (tools/profile_parity.py), for
what is ~1 GB of traffic. A separable bilinear resize is two small banded
matrices applied along H and W; as dense matmuls they ride the MXU instead:

    out[b, o, w, c] = sum_h M_h[o, h] * img[b, h, w, c]
    out[b, o, p, c] = sum_w M_w[p, w] * tmp[b, o, w, c]

The row weights reproduce jax.image.resize's half-pixel-center triangle
kernel exactly (same formula; antialias widening applied when downscaling,
matching jax.image's default), so outputs agree to fp tolerance — verified
by tests/test_ops_misc.py::test_matmul_resize_matches_jax_image.

Bonus: the output matrices can be built TALLER than the resized image with
zero rows/columns beyond it, fusing the static zero-padding of the detector
preprocess (GeneralizedRCNNTransform's batch pad, fcos.py:501-505 equiv)
into the same two matmuls — no separate 400 MB pad write.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def _resize_matrix(in_size: int, out_size: int,
                   padded_out: Optional[int] = None) -> np.ndarray:
    """[padded_out or out_size, in_size] bilinear weight rows.

    Row o holds the triangle-kernel weights for output center
    x = (o + 0.5) * in/out - 0.5 (jax.image half-pixel convention), with
    edge clamping via weight renormalization; rows >= out_size (the fused
    zero-pad region) are all zero. Downscale applies the antialias kernel
    widening (scale the triangle support by in/out), matching jax.image's
    antialias=True default.
    """
    rows = padded_out or out_size
    m = np.zeros((rows, in_size), np.float32)
    scale = out_size / in_size
    support = max(1.0, 1.0 / scale)          # antialias widening on downscale
    ks = np.arange(in_size, dtype=np.float64)
    for o in range(out_size):
        x = (o + 0.5) / scale - 0.5
        w = np.clip(1.0 - np.abs(ks - x) / support, 0.0, None)  # triangle
        total = w.sum()
        if total <= 0:
            continue
        # normalize over in-range taps only — jax.image's edge handling
        # (compute_weight_mat), NOT clamp-extend
        m[o] = (w / total).astype(np.float32)
    return m


def resize_bilinear_matmul(images: jnp.ndarray, out_h: int, out_w: int,
                           padded_hw: Optional[Tuple[int, int]] = None,
                           dtype=None) -> jnp.ndarray:
    """Bilinear-resize NHWC ``images`` to (out_h, out_w) via two matmuls.

    ``padded_hw``: optional (H, W) >= (out_h, out_w) — output is allocated
    at the padded size with zeros beyond the resized region (the fused
    detector batch-pad). ``dtype``: matmul compute dtype (default: input
    dtype; pass jnp.bfloat16 on the perf path).
    """
    b, h, w, c = images.shape
    ph, pw = padded_hw or (out_h, out_w)
    mh = jnp.asarray(_resize_matrix(h, out_h, ph))
    mw = jnp.asarray(_resize_matrix(w, out_w, pw))
    if dtype is not None:
        images = images.astype(dtype)
        mh = mh.astype(dtype)
        mw = mw.astype(dtype)
    x = jnp.einsum("oh,bhwc->bowc", mh, images,
                   preferred_element_type=jnp.float32)
    x = jnp.einsum("pw,bowc->bopc", mw, x.astype(mh.dtype),
                   preferred_element_type=jnp.float32)
    return x
