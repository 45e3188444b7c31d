"""6D object-pose error metrics + BOP-style average recall.

Reference: the vendored bop_toolkit's pose_error.py (ADD/ADI, rotation /
translation errors, MSSD/MSPD) driving BOPEvaluator
(dex-ycb-toolkit/dex_ycb_toolkit/bop_eval.py:53-288). Implemented here as
batched numpy over model point clouds; the render-based VSD metric requires
an offscreen GL renderer and is intentionally out of scope (host rendering —
SURVEY §2.6 note).

All poses are (R [3,3], t [3]) in millimeters.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


def transform_pts(pts: np.ndarray, R: np.ndarray, t: np.ndarray) -> np.ndarray:
    return pts @ R.T + t


def add_error(R_est, t_est, R_gt, t_gt, pts: np.ndarray) -> float:
    """Average distance of corresponding model points (ADD)."""
    est = transform_pts(pts, R_est, t_est)
    gt = transform_pts(pts, R_gt, t_gt)
    return float(np.linalg.norm(est - gt, axis=1).mean())


def adi_error(R_est, t_est, R_gt, t_gt, pts: np.ndarray) -> float:
    """Average closest-point distance (ADD-S / ADI, symmetric objects)."""
    est = transform_pts(pts, R_est, t_est)
    gt = transform_pts(pts, R_gt, t_gt)
    # nearest-neighbor via chunked pairwise distances (models are ~2-8k pts)
    nn = np.empty(len(gt))
    chunk = 512
    for i in range(0, len(gt), chunk):
        d = np.linalg.norm(gt[i:i + chunk, None, :] - est[None, :, :], axis=2)
        nn[i:i + chunk] = d.min(axis=1)
    return float(nn.mean())


def rotation_error(R_est: np.ndarray, R_gt: np.ndarray) -> float:
    """Geodesic rotation error in degrees."""
    cos = (np.trace(R_est @ R_gt.T) - 1.0) / 2.0
    return float(np.degrees(np.arccos(np.clip(cos, -1.0, 1.0))))


def translation_error(t_est: np.ndarray, t_gt: np.ndarray) -> float:
    return float(np.linalg.norm(np.asarray(t_est) - np.asarray(t_gt)))


def projection_error(R_est, t_est, R_gt, t_gt, K: np.ndarray,
                     pts: np.ndarray) -> float:
    """Mean 2D reprojection distance through intrinsics K."""
    def project(R, t):
        p = transform_pts(pts, R, t) @ K.T
        return p[:, :2] / p[:, 2:3]

    return float(np.linalg.norm(project(R_est, t_est) - project(R_gt, t_gt),
                                axis=1).mean())


def mssd(R_est, t_est, R_gt, t_gt, pts: np.ndarray,
         symmetries: Sequence[Tuple[np.ndarray, np.ndarray]] = ()) -> float:
    """Maximum symmetry-aware surface distance (BOP19)."""
    syms = list(symmetries) or [(np.eye(3), np.zeros(3))]
    best = np.inf
    est = transform_pts(pts, R_est, t_est)
    for Rs, ts in syms:
        gt = transform_pts(transform_pts(pts, Rs, ts), R_gt, t_gt)
        best = min(best, float(np.linalg.norm(est - gt, axis=1).max()))
    return best


def auc_add(errors: Sequence[float], max_threshold: float = 100.0,
            steps: int = 100) -> float:
    """PCK-style AUC of ADD errors (the common DexYCB object-pose summary)."""
    errors = np.asarray(errors, float)
    thresholds = np.linspace(0, max_threshold, steps)
    acc = (errors[None, :] <= thresholds[:, None]).mean(axis=1)
    return float(np.trapezoid(acc, thresholds) / max_threshold)


class BOPEvaluator:
    """Average recall over error thresholds, BOP19-style (without VSD).

    models: object_id -> [N, 3] model points (mm).
    diameters: object_id -> model diameter (mm) for relative thresholds.
    """

    def __init__(self, models: Dict[int, np.ndarray],
                 diameters: Dict[int, float]):
        self.models = models
        self.diameters = diameters

    def evaluate(self, estimates: List[Dict], ground_truth: List[Dict]
                 ) -> Dict[str, float]:
        """Each record: {image_id, obj_id, R, t}; estimates may add 'score'.

        Returns mean recall for ADD(-S) at 10% diameter (the classic
        criterion) plus MSSD average recall over thresholds 5..50% diameter.
        """
        gt_by = {(g["image_id"], g["obj_id"]): g for g in ground_truth}
        add_hits, mssd_recalls, n = [], [], 0
        errors_add = []
        for est in estimates:
            key = (est["image_id"], est["obj_id"])
            if key not in gt_by:
                continue
            gt = gt_by[key]
            pts = self.models[est["obj_id"]]
            diam = self.diameters[est["obj_id"]]
            err = adi_error(est["R"], est["t"], gt["R"], gt["t"], pts)
            errors_add.append(err)
            add_hits.append(err < 0.1 * diam)
            e_mssd = mssd(est["R"], est["t"], gt["R"], gt["t"], pts)
            ths = np.arange(0.05, 0.51, 0.05) * diam
            mssd_recalls.append(float((e_mssd < ths).mean()))
            n += 1
        return {
            "add_s_recall_0.1d": float(np.mean(add_hits)) if n else 0.0,
            "ar_mssd": float(np.mean(mssd_recalls)) if n else 0.0,
            "auc_add_s": auc_add(errors_add) if n else 0.0,
            "n_evaluated": n,
        }
