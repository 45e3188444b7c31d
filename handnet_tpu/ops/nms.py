"""Fixed-shape on-device NMS.

The reference relies on torchvision's C++/CUDA ``batched_nms`` inside a python
per-image loop (fcos_utils/fcos.py:621-635). On TPU, variable-length outputs
and host loops kill the compiler, so this module implements the TPU-native
design: take the top-K candidates, build the K x K IoU matrix once (an MXU/VPU
friendly dense op), and run a sequential greedy suppression over K steps with
``lax.fori_loop``. K is small (<=256), so the O(K^2) math is microseconds.

Outputs are always shape-[K]: suppressed entries are marked invalid rather than
removed. A validity mask threads through the rest of the pipeline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from handnet_tpu.ops.boxes import box_iou


def topk_candidates(scores: jnp.ndarray, k: int):
    """Top-k scores and indices along the last axis (descending)."""
    return jax.lax.top_k(scores, k)


def nms_fixed(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
              iou_thresh: float) -> jnp.ndarray:
    """Greedy NMS over a fixed set of K boxes.

    Args:
      boxes:  ``[K, 4]`` sorted by descending score (callers use top_k first).
      scores: ``[K]`` (only used to honor the sort; suppression is by order).
      valid:  ``[K]`` bool — candidates below the score threshold are invalid.
      iou_thresh: suppression threshold (reference uses 0.3, fcos.py:635).

    Returns:
      keep mask ``[K]`` (bool).
    """
    k = boxes.shape[0]
    iou = box_iou(boxes, boxes)  # [K, K]
    # overlap[i, j]: box j (lower score) overlaps box i enough to be suppressed
    overlap = iou > iou_thresh

    def body(i, keep):
        # if box i is kept, suppress every later box that overlaps it
        suppress = overlap[i] & (jnp.arange(k) > i) & keep[i]
        return keep & ~suppress

    keep = jax.lax.fori_loop(0, k, body, valid)
    return keep


def batched_nms_fixed(boxes: jnp.ndarray, scores: jnp.ndarray,
                      labels: jnp.ndarray, valid: jnp.ndarray,
                      iou_thresh: float) -> jnp.ndarray:
    """Class-aware NMS: boxes of different labels never suppress each other.

    Equivalent to torchvision ``batched_nms`` (used at fcos.py:635) via the
    standard coordinate-offset trick, but implemented by masking the IoU matrix
    instead of offsetting coordinates (cheaper and exact).
    """
    k = boxes.shape[0]
    iou = box_iou(boxes, boxes)
    same_class = labels[:, None] == labels[None, :]
    overlap = (iou > iou_thresh) & same_class

    def body(i, keep):
        suppress = overlap[i] & (jnp.arange(k) > i) & keep[i]
        return keep & ~suppress

    return jax.lax.fori_loop(0, k, body, valid)
