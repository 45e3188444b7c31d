"""HandNetPipeline — the fused detect -> crop -> pose graph.

Reference (handnet_pipeline/handnet_pipeline.py:38-116): frozen FCOS + frozen
A2J glued by host-side python — per-image box filtering, int casting, padding,
``F.interpolate`` crops, a ragged batch, and zero-filled rows when no hand is
found (:81-83, :107-108).

TPU-native design: the ENTIRE frame -> 21-joint path is one jitted graph that
never leaves HBM:
  resize+normalize -> ResNet34+FPN+heads -> fixed-shape decode+NMS ->
  masked argmax hand selection -> pad 40% -> dynamic-gather crop-resize ->
  ResNet50+A2J heads -> fused softmax aggregation -> (optional) unprojection.
"No hand" frames flow through as masked zeros instead of control flow, so the
graph is branch-free and pipelines across frames.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from handnet_tpu.config import HandNetConfig
from handnet_tpu.models.a2j import A2JSystem
from handnet_tpu.models.fcos import FCOSSystem
from handnet_tpu.ops.crop_resize import crop_resize_nearest, pad_box
from handnet_tpu.ops.geometry import convert_joints


class HandNetPipeline:
    """End-to-end hand perception: RGB(+D) frames in, UVD (or XYZ) joints out.

    Equivalent public surface to the reference's ``HandNet.forward(images,
    depth_images) -> (joints[B,21,3], crops, boxes)``, plus a validity mask
    (the reference signals "no hand" by zero rows, :107-108 — we return both).
    """

    def __init__(self, cfg: Optional[HandNetConfig] = None,
                 dtype: Any = jnp.float32):
        self.cfg = cfg or HandNetConfig()
        self.detector = FCOSSystem(self.cfg.fcos, dtype=dtype)
        self.a2j = A2JSystem(self.cfg.a2j, dtype=dtype)
        hand_label = self.cfg.pipeline.hand_label
        self.hand_label = (self.cfg.fcos.num_classes - 1
                           if hand_label is None else hand_label)

    def init(self, rng, batch_size: int = 1, image_h: int = 480,
             image_w: int = 640):
        rng_det, rng_a2j = jax.random.split(rng)
        return {
            "detector": self.detector.init(rng_det, batch_size),
            "a2j": self.a2j.init(rng_a2j, batch_size),
        }

    def __call__(self, variables, images: jnp.ndarray,
                 depth_images: jnp.ndarray,
                 paras: Optional[jnp.ndarray] = None
                 ) -> Dict[str, jnp.ndarray]:
        """Args:
          variables: {"detector": ..., "a2j": ...}
          images: ``[B, H, W, 3]`` RGB in 0-1.
          depth_images: ``[B, H, W]`` depth in meters (or ``[B, H, W, C]``).
          paras: optional ``[B, 4]`` intrinsics — when given, also returns XYZ mm.

        Returns dict:
          joints_uvd ``[B, 21, 3]`` (crop frame), boxes ``[B, 4]`` padded crop
          boxes, crops ``[B, 176, 176, C]``, found ``[B]`` bool, scores ``[B]``,
          sides ``[B]``, joints_xyz ``[B, 21, 3]`` mm (when paras given),
          joints_uvd_full ``[B, 21, 3]`` (full-image UV + depth).
        Frames without a detected hand have found=False and zeroed outputs
        (reference handnet_pipeline.py:107-108).
        """
        cfg = self.cfg
        b, img_h, img_w = images.shape[0], images.shape[1], images.shape[2]
        if depth_images.ndim == 3:
            depth_images = depth_images[..., None]
        if cfg.pipeline.rgbd and depth_images.shape[-1] == 4:
            # reference feeds BGR+D and swaps to RGB+D after the crop
            # (handnet_pipeline.py:102: [2,1,0,3] reorder) — same reorder here
            depth_images = depth_images[..., jnp.asarray([2, 1, 0, 3])]

        det = self.detector.detect(variables["detector"], images)

        # select the best hand box per image (reference keeps the first box,
        # :84-85, which is the highest-scoring one post-NMS)
        is_hand = (det["labels"] == self.hand_label) & det["valid"]
        hand_scores = jnp.where(is_hand, det["scores"], 0.0)   # [B, K]
        best = hand_scores.argmax(axis=1)                       # [B]
        found = jnp.take_along_axis(is_hand, best[:, None], axis=1)[:, 0]
        score = jnp.take_along_axis(hand_scores, best[:, None], axis=1)[:, 0]
        box = jnp.take_along_axis(det["boxes"], best[:, None, None],
                                  axis=1)[:, 0]                 # [B, 4]
        side = jnp.take_along_axis(det["sides"], best[:, None], axis=1)[:, 0]

        # pad by 40% and clip (reference :88-97, int64 truncation semantics)
        crop_box = jax.vmap(
            lambda bx: pad_box(bx, cfg.pipeline.pad_percent, img_h, img_w)
        )(box)
        # degenerate box for not-found frames keeps the gather in-bounds
        crop_box = jnp.where(found[:, None], crop_box,
                             jnp.asarray([0, 0, 175, 175], jnp.int32))

        crops = jax.vmap(
            lambda im, bx: crop_resize_nearest(
                im, bx, cfg.pipeline.crop_size, cfg.pipeline.crop_size)
        )(depth_images, crop_box)                                # [B, S, S, C]

        joints_uvd = self.a2j.predict(variables["a2j"], crops)   # [B, 21, 3]
        joints_uvd = joints_uvd * found[:, None, None]

        out = {
            "joints_uvd": joints_uvd,
            "boxes": crop_box.astype(jnp.float32),
            "crops": crops,
            "found": found,
            "scores": score,
            "sides": side,
        }
        if paras is not None:
            xyz = convert_joints(joints_uvd, crop_box.astype(jnp.float32),
                                 paras, cfg.pipeline.crop_size,
                                 cfg.pipeline.crop_size)
            out["joints_xyz"] = xyz * found[:, None, None]
        return out

    def detect(self, variables, images: jnp.ndarray):
        """Detector-only entry (the reference's ``is_detect=True`` branch,
        handnet_pipeline.py:63-65): padded detections in original pixels."""
        return self.detector.detect(variables["detector"], images)

    def pose(self, variables, depth_crops: jnp.ndarray) -> jnp.ndarray:
        """Pose-only entry (the ``is_3D=True`` branch): pre-cropped depth
        ``[B, S, S, C]`` -> UVD joints."""
        return self.a2j.predict(variables["a2j"], depth_crops)

    def jit(self, with_xyz: bool = False):
        """Return a jit-compiled forward with static config baked in."""
        if with_xyz:
            return jax.jit(lambda v, im, d, p: self(v, im, d, p))
        return jax.jit(lambda v, im, d: self(v, im, d))
