"""E2E full-frame dataset source: image + detection target + 3D hand sample.

Reference: datasets3d/e2edataset.py:19-261 — full-frame RGB, detection
targets (YCB objects by id + hand as category 22 with handedness box_info),
and a "sample" dict carrying verts3d / joints3d / joints2d (the TransQueries
vocabulary, datasets3d/queries.py) plus the hand box and camera intrinsics.

This source feeds both pipeline-level training/eval and the mesh head: the
3D labels come from the label npz (joint_3d) or from the MANO layer when
regenerating from pose_m like the reference's load_3d (e2edataset.py:94-157).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from handnet_tpu.data.detect_data import build_detection_target
from handnet_tpu.data.dexycb import HAND_SEG_LABEL, paras_from_intrinsics
from handnet_tpu.data.a2j_data import hand_bbox_from_seg


class E2EDataSource:
    """Indexable DexYCB -> full e2e sample source."""

    def __init__(self, dataset, refined_idx, max_boxes: int = 8,
                 mano_layers: Optional[Dict] = None):
        """mano_layers: optional {'left': ManoLayer, 'right': ManoLayer} to
        regenerate verts3d from pose_m when the npz lacks them."""
        self.dataset = dataset
        self.refined_idx = list(refined_idx)
        self.max_boxes = max_boxes
        self.mano_layers = mano_layers or {}

    def __len__(self):
        return len(self.refined_idx)

    def _mesh_from_pose(self, label, sample) -> Optional[np.ndarray]:
        side = sample["mano_side"]
        if side not in self.mano_layers or "pose_m" not in label:
            return None
        pose_m = label["pose_m"].reshape(-1)
        if not pose_m.any():
            return None
        import jax.numpy as jnp

        layer = self.mano_layers[side]
        verts, _ = layer(
            jnp.asarray(pose_m[None, :48]),
            jnp.asarray(np.asarray(sample["mano_betas"], np.float32)[None]),
            jnp.asarray(pose_m[None, 48:51]))
        return np.asarray(verts[0]) / 1000.0  # back to meters

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        import cv2

        sample = self.dataset[self.refined_idx[idx]]
        color = cv2.imread(sample["color_file"])[:, :, ::-1]
        depth = cv2.imread(sample["depth_file"], cv2.IMREAD_ANYDEPTH)
        label = np.load(sample["label_file"])

        target = build_detection_target(label["seg"], sample["ycb_ids"],
                                        sample["mano_side"], self.max_boxes,
                                        e2e=True)
        hand_box = hand_bbox_from_seg(label["seg"], pad_percent=0.0)
        if hand_box is None:
            hand_box = np.zeros(4, np.float32)

        joints2d = label["joint_2d"].reshape(21, 2).astype(np.float32)
        out = {
            "image": color.astype(np.float32) / 255.0,
            "depth": depth.astype(np.float32) / 1000.0,
            "dexycb_id": np.asarray([self.refined_idx[idx]], np.int64),
            "joints3d": label["joint_3d"].reshape(21, 3).astype(np.float32),
            # joints2d relative to the hand box corner (e2edataset.py:223)
            "joints2d": joints2d - hand_box[None, :2].astype(np.float32),
            "joints2d_abs": joints2d,
            "hand_box": np.asarray(hand_box, np.float32),
            "side": np.asarray(
                [1 if sample["mano_side"] == "right" else 0], np.int32),
            "paras": paras_from_intrinsics(sample["intrinsics"]),
            **{f"target_{k}": v for k, v in target.items()},
        }
        verts = self._mesh_from_pose(label, sample)
        if verts is not None:
            out["verts3d"] = verts.astype(np.float32)
        return out
