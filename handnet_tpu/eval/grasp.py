"""Grasp coverage/precision evaluation (handover-safety metric).

Reference: dex-ycb-toolkit/dex_ycb_toolkit/grasp_eval.py:47-664. The core
metric (:305-357): a predicted grasp "covers" a ground-truth grasp when their
translations are within ``radius`` AND the relative rotation angle is within
``angle``; coverage = fraction of GT grasps covered, precision = fraction of
(collision-free) predicted grasps that cover some GT grasp.

This module implements that metric plus a point-cloud collision filter
(gripper points vs hand points within ``collision_dist``) — the mesh/pyrender
visualization path of the reference stays out of scope (host GL).

Grasps are [N, 7]: translation (x, y, z) + quaternion (w, x, y, z).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np

RADIUS = (0.01, 0.02)                 # meters (reference _RADIUS)
ANGLES = (np.deg2rad(15), np.deg2rad(30))
DIST_THRESHOLDS = (0.0, 0.01)


def quat_conjugate(q: np.ndarray) -> np.ndarray:
    return q * np.array([1.0, -1.0, -1.0, -1.0])


def quat_multiply(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    w1, x1, y1, z1 = np.moveaxis(a, -1, 0)
    w2, x2, y2, z2 = np.moveaxis(b, -1, 0)
    return np.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], axis=-1)


def quat_rotation_angle(q: np.ndarray) -> np.ndarray:
    """|rotation angle| of unit quaternion(s), in radians."""
    w = np.clip(np.abs(q[..., 0]) / np.maximum(
        np.linalg.norm(q, axis=-1), 1e-12), -1.0, 1.0)
    return 2.0 * np.arccos(w)


def grasp_coverage(samples: np.ndarray, gt_poses: np.ndarray,
                   radius: float, angle: float
                   ) -> Tuple[int, np.ndarray]:
    """How many of ``gt_poses`` are covered by ``samples``
    (grasp_eval.py:305-357 semantics, vectorized — no kdtree needed at these
    set sizes).

    Returns (num_covered_gt, indices of covering samples).
    """
    if len(samples) == 0 or len(gt_poses) == 0:
        return 0, np.array([], np.int32)
    dist = np.linalg.norm(
        gt_poses[:, None, :3] - samples[None, :, :3], axis=-1)  # [G, S]
    rel = quat_multiply(quat_conjugate(gt_poses[:, None, 3:]),
                        samples[None, :, 3:])
    ang = quat_rotation_angle(rel)
    near = (dist <= radius) & (np.abs(ang) < angle)
    covered_gt = int((near.any(axis=1)).sum())
    covering = np.unique(np.nonzero(near.any(axis=0))[0]).astype(np.int32)
    return covered_gt, covering


def collision_free_mask(grasps_tf: np.ndarray, gripper_pc: np.ndarray,
                        hand_pc: np.ndarray,
                        collision_dist: float = 0.0) -> np.ndarray:
    """Point-based collision check: a grasp collides when any transformed
    gripper point is within ``collision_dist`` of the hand point cloud.

    grasps_tf [G, 4, 4]; gripper_pc [P, 3]; hand_pc [N, 3].
    """
    if len(hand_pc) == 0:
        return np.ones(len(grasps_tf), bool)
    out = np.ones(len(grasps_tf), bool)
    for i, tf in enumerate(grasps_tf):
        pts = gripper_pc @ tf[:3, :3].T + tf[:3, 3]
        d = np.linalg.norm(pts[:, None, :] - hand_pc[None, :, :], axis=-1)
        out[i] = d.min() > collision_dist
    return out


class GraspEvaluator:
    """Scene-set coverage/precision sweeps over (radius, angle, threshold)
    grids (grasp_eval.py:586-649 aggregation)."""

    def __init__(self, radius: Sequence[float] = RADIUS,
                 angles: Sequence[float] = ANGLES,
                 dist_thresholds: Sequence[float] = DIST_THRESHOLDS):
        self.radius = tuple(radius)
        self.angles = tuple(angles)
        self.dist_thresholds = tuple(dist_thresholds)

    def evaluate_scene(self, pred_grasps: np.ndarray, gt_grasps: np.ndarray,
                       pred_collision_free: np.ndarray | None = None
                       ) -> Dict:
        """pred/gt: [N, 7] pose+quat. Returns nested coverage/precision."""
        if pred_collision_free is None:
            pred_collision_free = np.ones(len(pred_grasps), bool)
        pred_ok = pred_grasps[pred_collision_free]
        coverage: Dict = {}
        precision: Dict = {}
        for r in self.radius:
            for a in self.angles:
                n_cov_gt, _ = grasp_coverage(pred_ok, gt_grasps, r, a)
                n_cov_pred, _ = grasp_coverage(gt_grasps, pred_ok, r, a)
                cov = n_cov_gt / max(len(gt_grasps), 1)
                prec = n_cov_pred / max(len(pred_ok), 1)
                coverage.setdefault(r, {})[a] = cov
                precision.setdefault(r, {})[a] = prec
        return {"coverage": coverage, "precision": precision}

    def aggregate(self, scene_results: Sequence[Dict]) -> Dict[str, float]:
        out = {}
        for r in self.radius:
            for a in self.angles:
                cov = np.mean([s["coverage"][r][a] for s in scene_results])
                prec = np.mean([s["precision"][r][a] for s in scene_results])
                key = f"r{r:g}_a{np.degrees(a):.0f}"
                out[f"coverage_{key}"] = float(cov)
                out[f"precision_{key}"] = float(prec)
        return out
