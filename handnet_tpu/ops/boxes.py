"""Box coders, IoU and GIoU — vectorized, fixed-shape, jit-friendly.

TPU-native equivalents of the reference box math:
* ``BoxLinearCoder`` (FCOS l,t,r,b encoding)  — reference fcos_utils/det_utils.py:220-294
* ``BoxCoder`` (Faster-RCNN deltas)           — reference fcos_utils/det_utils.py:121-217
* ``generalized_box_iou_loss``                — reference fcos_utils/utils.py:3-62
* ``box_iou`` pairwise matrix (the torchvision C++ op the reference leans on for NMS)

All functions operate on ``[..., 4]`` arrays in (x1, y1, x2, y2) format and are
batched by construction — no per-image python loops.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# FCOS linear coder (distance-to-edges).


def linear_encode(anchors: jnp.ndarray, boxes: jnp.ndarray,
                  normalize_by_size: bool = True) -> jnp.ndarray:
    """Encode target ``boxes`` relative to (square) ``anchors`` as (l, t, r, b).

    Mirrors det_utils.py:233-264 but batched over arbitrary leading dims.
    """
    ctr_x = 0.5 * (anchors[..., 0] + anchors[..., 2])
    ctr_y = 0.5 * (anchors[..., 1] + anchors[..., 3])
    target = jnp.stack(
        [
            ctr_x - boxes[..., 0],
            ctr_y - boxes[..., 1],
            boxes[..., 2] - ctr_x,
            boxes[..., 3] - ctr_y,
        ],
        axis=-1,
    )
    if normalize_by_size:
        w = anchors[..., 2] - anchors[..., 0]
        h = anchors[..., 3] - anchors[..., 1]
        size = jnp.stack([w, h, w, h], axis=-1)
        target = target / size
    return target


def linear_decode(rel_codes: jnp.ndarray, anchors: jnp.ndarray,
                  normalize_by_size: bool = True) -> jnp.ndarray:
    """Decode (l, t, r, b) offsets back to boxes (det_utils.py:266-294)."""
    ctr_x = 0.5 * (anchors[..., 0] + anchors[..., 2])
    ctr_y = 0.5 * (anchors[..., 1] + anchors[..., 3])
    if normalize_by_size:
        w = anchors[..., 2] - anchors[..., 0]
        h = anchors[..., 3] - anchors[..., 1]
        size = jnp.stack([w, h, w, h], axis=-1)
        rel_codes = rel_codes * size
    return jnp.stack(
        [
            ctr_x - rel_codes[..., 0],
            ctr_y - rel_codes[..., 1],
            ctr_x + rel_codes[..., 2],
            ctr_y + rel_codes[..., 3],
        ],
        axis=-1,
    )


# ---------------------------------------------------------------------------
# Faster-RCNN delta coder (used by the alternative FPN detector).

BBOX_XFORM_CLIP = math.log(1000.0 / 16)


def delta_encode(reference_boxes: jnp.ndarray, proposals: jnp.ndarray,
                 weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """Encode ``reference_boxes`` (GT) w.r.t. ``proposals`` as (dx, dy, dw, dh).

    Matches det_utils.py:7-58 (encode_boxes).
    """
    wx, wy, ww, wh = weights
    ex_w = proposals[..., 2] - proposals[..., 0]
    ex_h = proposals[..., 3] - proposals[..., 1]
    ex_cx = proposals[..., 0] + 0.5 * ex_w
    ex_cy = proposals[..., 1] + 0.5 * ex_h

    gt_w = reference_boxes[..., 2] - reference_boxes[..., 0]
    gt_h = reference_boxes[..., 3] - reference_boxes[..., 1]
    gt_cx = reference_boxes[..., 0] + 0.5 * gt_w
    gt_cy = reference_boxes[..., 1] + 0.5 * gt_h

    return jnp.stack(
        [
            wx * (gt_cx - ex_cx) / ex_w,
            wy * (gt_cy - ex_cy) / ex_h,
            ww * jnp.log(gt_w / ex_w),
            wh * jnp.log(gt_h / ex_h),
        ],
        axis=-1,
    )


def delta_decode(rel_codes: jnp.ndarray, boxes: jnp.ndarray,
                 weights=(1.0, 1.0, 1.0, 1.0),
                 bbox_xform_clip: float = BBOX_XFORM_CLIP) -> jnp.ndarray:
    """Decode deltas back to boxes (det_utils.py:176-217)."""
    wx, wy, ww, wh = weights
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h

    dx = rel_codes[..., 0] / wx
    dy = rel_codes[..., 1] / wy
    dw = jnp.minimum(rel_codes[..., 2] / ww, bbox_xform_clip)
    dh = jnp.minimum(rel_codes[..., 3] / wh, bbox_xform_clip)

    pred_cx = dx * w + cx
    pred_cy = dy * h + cy
    pred_w = jnp.exp(dw) * w
    pred_h = jnp.exp(dh) * h
    return jnp.stack(
        [
            pred_cx - 0.5 * pred_w,
            pred_cy - 0.5 * pred_h,
            pred_cx + 0.5 * pred_w,
            pred_cy + 0.5 * pred_h,
        ],
        axis=-1,
    )


# ---------------------------------------------------------------------------
# IoU / GIoU.


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU matrix ``[N, M]`` between two box sets ``[N,4]`` / ``[M,4]``."""
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, min=0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(boxes1)[..., :, None] + box_area(boxes2)[..., None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def giou_loss(boxes1: jnp.ndarray, boxes2: jnp.ndarray,
              eps: float = 1e-7) -> jnp.ndarray:
    """Elementwise generalized-IoU loss (reference fcos_utils/utils.py:3-62).

    Returns per-box loss ``1 - GIoU``; callers apply their own masked reduction
    (the reference's ``reduction='sum'`` over foreground becomes a masked sum).
    """
    x1, y1, x2, y2 = jnp.moveaxis(boxes1, -1, 0)
    x1g, y1g, x2g, y2g = jnp.moveaxis(boxes2, -1, 0)

    xkis1 = jnp.maximum(x1, x1g)
    ykis1 = jnp.maximum(y1, y1g)
    xkis2 = jnp.minimum(x2, x2g)
    ykis2 = jnp.minimum(y2, y2g)

    overlap = (ykis2 > ykis1) & (xkis2 > xkis1)
    intsctk = jnp.where(overlap, (xkis2 - xkis1) * (ykis2 - ykis1), 0.0)
    unionk = (x2 - x1) * (y2 - y1) + (x2g - x1g) * (y2g - y1g) - intsctk
    iouk = intsctk / (unionk + eps)

    xc1 = jnp.minimum(x1, x1g)
    yc1 = jnp.minimum(y1, y1g)
    xc2 = jnp.maximum(x2, x2g)
    yc2 = jnp.maximum(y2, y2g)
    area_c = (xc2 - xc1) * (yc2 - yc1)
    miouk = iouk - (area_c - unionk) / (area_c + eps)
    return 1.0 - miouk


def clip_boxes(boxes: jnp.ndarray, height, width) -> jnp.ndarray:
    """Clip boxes to ``[0, width] x [0, height]``."""
    x1 = jnp.clip(boxes[..., 0], 0, width)
    y1 = jnp.clip(boxes[..., 1], 0, height)
    x2 = jnp.clip(boxes[..., 2], 0, width)
    y2 = jnp.clip(boxes[..., 3], 0, height)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def resize_boxes(boxes: jnp.ndarray, from_size, to_size) -> jnp.ndarray:
    """Rescale boxes between image sizes (reference fcos.py:770-783)."""
    ratio_h = to_size[0] / from_size[0]
    ratio_w = to_size[1] / from_size[1]
    scale = jnp.asarray([ratio_w, ratio_h, ratio_w, ratio_h], dtype=boxes.dtype)
    return boxes * scale
