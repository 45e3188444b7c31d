"""On-device dynamic crop + fixed-size resample — the detect->pose stage handoff.

The reference does this on the host with fancy indexing plus ``F.interpolate``
(handnet_pipeline/handnet_pipeline.py:101: ``F.interpolate(depth[...,
y1:y2+1, x1:x2+1], size=(176,176))`` — note torch's *default nearest* mode) and,
at training-data time, ``cv2.resize(..., INTER_NEAREST)`` (a2jdataset.py:270).

TPU-native design: the crop rectangle is a traced value, so we express the
crop+resize as ONE gather with dynamically computed indices — no host round
trip, no dynamic shapes. For output pixel i of ``out_size`` the source index is
``y0 + floor(i * box_h / out_size)`` which reproduces torch's
``F.interpolate(mode='nearest')`` semantics exactly (src = floor(dst * scale)).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _nearest_idx(start, length, out_size: int):
    """Integer source indices for nearest resize of a dynamic-length range."""
    i = jnp.arange(out_size, dtype=jnp.int32)
    # floor(i * length / out) with integer math; length is traced
    return start + (i * length) // out_size


def crop_resize_nearest(image: jnp.ndarray, box: jnp.ndarray,
                        out_h: int, out_w: int) -> jnp.ndarray:
    """Crop ``image`` to integer ``box`` (x1, y1, x2, y2 inclusive) and resize.

    Args:
      image: ``[H, W, C]`` (or ``[H, W]``).
      box:   ``[4]`` int32 — inclusive corners, mirroring the reference's
             ``box[1]:box[3]+1, box[0]:box[2]+1`` slicing (handnet_pipeline.py:101).
      out_h, out_w: static output size (176 x 176 in the pipeline).

    Returns ``[out_h, out_w, C]`` (or ``[out_h, out_w]``).
    """
    x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
    h = jnp.maximum(y2 - y1 + 1, 1)
    w = jnp.maximum(x2 - x1 + 1, 1)
    ys = _nearest_idx(y1, h, out_h)
    xs = _nearest_idx(x1, w, out_w)
    ys = jnp.clip(ys, 0, image.shape[0] - 1)
    xs = jnp.clip(xs, 0, image.shape[1] - 1)
    # two single-axis takes instead of one 2-D advanced-index gather: XLA/TPU
    # lowers axis gathers to cheap dynamic-slice loops, while the fused 2-D
    # gather becomes a scalarized scatter that dominated the whole pipeline
    return jnp.take(jnp.take(image, ys, axis=0), xs, axis=1)


def crop_resize_bilinear(image: jnp.ndarray, box: jnp.ndarray,
                         out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear variant (half-pixel centers, align_corners=False semantics)."""
    x1, y1, x2, y2 = (box[i].astype(jnp.float32) for i in range(4))
    h = jnp.maximum(y2 - y1 + 1.0, 1.0)
    w = jnp.maximum(x2 - x1 + 1.0, 1.0)
    sy = h / out_h
    sx = w / out_w
    fy = y1 + (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * sy - 0.5
    fx = x1 + (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * sx - 0.5

    y0 = jnp.clip(jnp.floor(fy), 0, image.shape[0] - 1)
    x0 = jnp.clip(jnp.floor(fx), 0, image.shape[1] - 1)
    y1i = jnp.clip(y0 + 1, 0, image.shape[0] - 1).astype(jnp.int32)
    x1i = jnp.clip(x0 + 1, 0, image.shape[1] - 1).astype(jnp.int32)
    wy = jnp.clip(fy - y0, 0.0, 1.0)
    wx = jnp.clip(fx - x0, 0.0, 1.0)
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    squeeze = image.ndim == 2
    img = image[:, :, None] if squeeze else image
    p00 = img[y0[:, None], x0[None, :]]
    p01 = img[y0[:, None], x1i[None, :]]
    p10 = img[y1i[:, None], x0[None, :]]
    p11 = img[y1i[:, None], x1i[None, :]]
    wy_ = wy[:, None, None]
    wx_ = wx[None, :, None]
    out = ((1 - wy_) * (1 - wx_) * p00 + (1 - wy_) * wx_ * p01
           + wy_ * (1 - wx_) * p10 + wy_ * wx_ * p11)
    return out[:, :, 0] if squeeze else out


@partial(jax.jit, static_argnums=(2, 3, 4))
def batch_crop_resize(images: jnp.ndarray, boxes: jnp.ndarray,
                      out_h: int, out_w: int, mode: str = "nearest") -> jnp.ndarray:
    """vmap'd crop-resize over a batch: ``[B,H,W,C] x [B,4] -> [B,out_h,out_w,C]``."""
    fn = crop_resize_nearest if mode == "nearest" else crop_resize_bilinear
    return jax.vmap(lambda im, bx: fn(im, bx, out_h, out_w))(images, boxes)


def pad_box(box: jnp.ndarray, percent: float, image_h, image_w) -> jnp.ndarray:
    """Pad an (x1,y1,x2,y2) box by ``percent`` of its size, clipped to the image.

    Integer-truncation semantics match the reference's int64 box arithmetic
    (handnet_pipeline.py:88-97: box is cast to int64 *before* padding).
    """
    box = box.astype(jnp.int32)
    w = box[2] - box[0]
    h = box[3] - box[1]
    dx = (percent * w).astype(jnp.int32)
    dy = (percent * h).astype(jnp.int32)
    x1 = jnp.maximum(0, box[0] - dx)
    y1 = jnp.maximum(0, box[1] - dy)
    x2 = jnp.minimum(image_w, box[2] + dx)
    y2 = jnp.minimum(image_h, box[3] + dy)
    return jnp.stack([x1, y1, x2, y2])
