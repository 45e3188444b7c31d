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
from handnet_tpu.models.pose2mesh import normalize_joints_for_pose2mesh_batched
from handnet_tpu.ops.crop_resize import crop_resize_nearest, pad_box
from handnet_tpu.ops.geometry import convert_joints, crop_uvd_to_image_uvd


class HandNetPipeline:
    """End-to-end hand perception: RGB(+D) frames in, UVD (or XYZ) joints out.

    Equivalent public surface to the reference's ``HandNet.forward(images,
    depth_images) -> (joints[B,21,3], crops, boxes)``, plus a validity mask
    (the reference signals "no hand" by zero rows, :107-108 — we return both).
    """

    def __init__(self, cfg: Optional[HandNetConfig] = None,
                 dtype: Any = jnp.float32, mesh_faces=None):
        self.cfg = cfg or HandNetConfig()
        self.detector = FCOSSystem(self.cfg.fcos, dtype=dtype)
        self.a2j = A2JSystem(self.cfg.a2j, dtype=dtype)
        hand_label = self.cfg.pipeline.hand_label
        self.hand_label = (self.cfg.fcos.num_classes - 1
                           if hand_label is None else hand_label)
        self.pose2mesh = None
        if self.cfg.pipeline.with_mesh:
            # fused Pose2Mesh head: frame -> joints -> 778-vert mesh in ONE
            # jitted graph (the reference lifts per frame on the host,
            # ros_demo.py:131-168). ``mesh_faces`` [F,3] selects the real
            # MANO triangulation (convert/mano_assets.py npz); without it a
            # same-size strip stand-in keeps the plumbing runnable.
            import numpy as np

            from handnet_tpu.models.pose2mesh import Pose2Mesh
            from handnet_tpu.ops.graph import build_graph_pyramid

            if mesh_faces is None:
                mesh_faces = np.stack([np.arange(776), np.arange(1, 777),
                                       np.arange(2, 778)], axis=1)
            skeleton = tuple((0, i) for i in (1, 5, 9, 13, 17)) + tuple(
                (i, i + 1) for i in range(1, 20) if i % 4 != 0)
            self._pyramid = build_graph_pyramid(
                np.asarray(mesh_faces, np.int64),
                self.cfg.pose2mesh.num_joints, skeleton, levels=6)
            self.mesh_faces = np.asarray(mesh_faces, np.int64)
            self.pose2mesh = Pose2Mesh(pyramid=self._pyramid,
                                       cfg=self.cfg.pose2mesh, dtype=dtype)

    def init(self, rng, batch_size: int = 1, image_h: int = 480,
             image_w: int = 640):
        rng_det, rng_a2j, rng_mesh = jax.random.split(rng, 3)
        variables = {
            "detector": self.detector.init(rng_det, batch_size),
            "a2j": self.a2j.init(rng_a2j, batch_size),
        }
        if self.pose2mesh is not None:
            variables["pose2mesh"] = self.pose2mesh.init(
                rng_mesh,
                jnp.zeros((1, self.cfg.pose2mesh.num_joints, 2)))
        return variables

    def needs_calibration(self) -> bool:
        """True when this config serves static-int8 (``quant="static"``) —
        a :meth:`calibrate` / ``load_calibration`` pass is required before
        serving (every entry point gates on this one predicate)."""
        return "static" in (self.cfg.fcos.quant, self.cfg.a2j.quant)

    def _detect_and_crop(self, variables, images: jnp.ndarray,
                         depth_images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """Detector -> best hand box -> padded crop (the pipeline up to the
        A2J input; reference handnet_pipeline.py:63-102)."""
        cfg = self.cfg
        img_h, img_w = images.shape[1], images.shape[2]
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
        return {"found": found, "scores": score, "sides": side,
                "crop_box": crop_box, "crops": crops}

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
          joints_uvd_full ``[B, 21, 3]`` (full-image UV + depth). With
          ``pipeline.with_mesh``: verts ``[B, 778, 3]`` root-relative meters
          and (when paras given) verts_xyz ``[B, 778, 3]`` camera-frame mm.
        Frames without a detected hand have found=False and zeroed outputs
        (reference handnet_pipeline.py:107-108).
        """
        cfg = self.cfg
        stage = self._detect_and_crop(variables, images, depth_images)
        found, score, side = stage["found"], stage["scores"], stage["sides"]
        crop_box, crops = stage["crop_box"], stage["crops"]

        joints_uvd = self.a2j.predict(variables["a2j"], crops)   # [B, 21, 3]
        joints_uvd = joints_uvd * found[:, None, None]

        out = {
            "joints_uvd": joints_uvd,
            "boxes": crop_box.astype(jnp.float32),
            "crops": crops,
            "found": found,
            "scores": score,
            "sides": side,
            "joints_uvd_full": crop_uvd_to_image_uvd(
                joints_uvd, crop_box.astype(jnp.float32),
                cfg.pipeline.crop_size, cfg.pipeline.crop_size
            ) * found[:, None, None],
        }
        if paras is not None:
            xyz = convert_joints(joints_uvd, crop_box.astype(jnp.float32),
                                 paras, cfg.pipeline.crop_size,
                                 cfg.pipeline.crop_size)
            out["joints_xyz"] = xyz * found[:, None, None]
        if self.pose2mesh is not None:
            # normalization is similarity-invariant, so crop-frame UV feeds
            # the lifter identically to image-frame UV (apps/demo.py does the
            # same on the host; ros_demo.py:148-160)
            norm = normalize_joints_for_pose2mesh_batched(
                joints_uvd[..., :2])
            mesh_padded, _ = self.pose2mesh.apply(variables["pose2mesh"],
                                                  norm)
            verts = jnp.take(mesh_padded,
                             jnp.asarray(self._pyramid.perm_reverse[:778]),
                             axis=1)                             # [B, 778, 3]
            # pose2mesh emits meter-scale root-relative verts
            out["verts"] = verts * found[:, None, None]
            if paras is not None:
                # camera-frame mm: verts*1000 anchored at the predicted
                # wrist (reference ros_demo.py:334 mesh*1000 + joints3d)
                out["verts_xyz"] = ((verts * 1000.0
                                     + out["joints_xyz"][:, :1])
                                    * found[:, None, None])
        return out

    def calibrate(self, variables, images, depth_images, margin=None):
        """One-pass activation-scale calibration for the static-int8 path
        (``quant="static"``, nn/quant.py).

        Records each QuantConv's running activation amax into the
        ``quant_stats`` collection, in serving order: the detector sees the
        frames first, then A2J sees the crops the *calibrated* detector
        produces (the crop distribution is what A2J serves on).
        ``images``/``depth_images`` may be single batches or sequences of
        same-shaped batches — amaxes fold with ``max`` across all of them.
        After the last batch the amaxes are widened by ``1 + margin``
        (default ``cfg.pipeline.quant_margin``; nn/quant.apply_margin) for
        saturation headroom against distribution shift — pass your batches
        in ONE call so the margin is applied once; repeated ``calibrate``
        calls compound it. A no-op (returns ``variables`` unchanged) for
        float/dynamic-quant configs.
        """
        from handnet_tpu.models.fcos import preprocess
        from handnet_tpu.nn.quant import apply_margin

        if getattr(self, "_cal_fns", None) is None:
            @jax.jit
            def det_cal(v_det, im):
                net_in, _ = preprocess(im, self.cfg.fcos)
                _, upd = self.detector.module.apply(
                    v_det, net_in, train=False, mutable=["quant_stats"])
                return upd

            @jax.jit
            def a2j_cal(v_det, v_a2j, im, d):
                # only the stages feeding A2J run — the A2J serving forward
                # with its (still-zero) static scales and the mesh head
                # would be wasted work here
                crops = self._detect_and_crop(
                    {"detector": v_det}, im, d)["crops"]
                _, upd = self.a2j.module.apply(v_a2j, crops, train=False,
                                               mutable=["quant_stats"])
                return upd

            # cache so multi-batch calibration doesn't re-jit per batch
            self._cal_fns = (det_cal, a2j_cal)
        det_cal, a2j_cal = self._cal_fns

        if isinstance(images, (list, tuple)):
            batches = list(zip(images, depth_images))
        else:
            batches = [(images, depth_images)]

        variables = dict(variables)
        # detector over ALL batches first: the a2j calibration crops with
        # the detector's final static scales, matching serving
        for im, _ in batches:
            det_upd = det_cal(variables["detector"], im)
            det_upd = {k: v for k, v in det_upd.items() if v}  # drop empties
            variables["detector"] = {**variables["detector"], **det_upd}
        for im, d in batches:
            a2j_upd = a2j_cal(variables["detector"], variables["a2j"], im, d)
            a2j_upd = {k: v for k, v in a2j_upd.items() if v}
            variables["a2j"] = {**variables["a2j"], **a2j_upd}
        if margin is None:
            margin = self.cfg.pipeline.quant_margin
        if margin:
            variables = apply_margin(variables, margin)
        return variables

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
