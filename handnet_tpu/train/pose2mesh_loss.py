"""Pose2Mesh training losses — batched jnp versions.

Reference: pose2mesh/lib/core/loss.py — CoordLoss (masked L1), NormalVectorLoss
(predicted edges vs GT face normals), EdgeLengthLoss (edge-length L1),
LaplacianLoss (uniform Laplacian smoothness). All re-expressed as fused
einsum/elementwise ops over ``[B, V, 3]`` coordinates.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np


def coord_l1(pred: jnp.ndarray, target: jnp.ndarray,
             valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Masked mean-L1 (CoordLoss with has_valid)."""
    if valid is not None:
        pred = pred * valid
        target = target * valid
    return jnp.abs(pred - target).mean()


def _unit(v, eps=1e-12):
    return v / jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + eps)


def normal_vector_loss(pred: jnp.ndarray, target: jnp.ndarray,
                       faces: np.ndarray) -> jnp.ndarray:
    """Mean |cos| between predicted triangle edges and GT face normals."""
    f = jnp.asarray(faces)
    p0, p1, p2 = pred[:, f[:, 0]], pred[:, f[:, 1]], pred[:, f[:, 2]]
    g0, g1, g2 = target[:, f[:, 0]], target[:, f[:, 1]], target[:, f[:, 2]]
    e1 = _unit(p1 - p0)
    e2 = _unit(p2 - p0)
    e3 = _unit(p2 - p1)
    n_gt = _unit(jnp.cross(_unit(g1 - g0), _unit(g2 - g0)))
    cos = jnp.stack([jnp.abs(jnp.sum(e * n_gt, -1)) for e in (e1, e2, e3)], 1)
    return cos.mean()


def edge_length_loss(pred: jnp.ndarray, target: jnp.ndarray,
                     faces: np.ndarray) -> jnp.ndarray:
    f = jnp.asarray(faces)

    def lengths(x):
        a, b, c = x[:, f[:, 0]], x[:, f[:, 1]], x[:, f[:, 2]]
        return jnp.stack([
            jnp.sqrt(jnp.sum((a - b) ** 2, -1) + 1e-12),
            jnp.sqrt(jnp.sum((a - c) ** 2, -1) + 1e-12),
            jnp.sqrt(jnp.sum((b - c) ** 2, -1) + 1e-12),
        ], 1)

    return jnp.abs(lengths(pred) - lengths(target)).mean()


def uniform_laplacian(faces: np.ndarray, n_verts: int) -> np.ndarray:
    """Row-normalized uniform Laplacian matrix (LaplacianLoss ctor)."""
    lap = np.zeros((n_verts, n_verts), np.float32)
    f = np.asarray(faces)
    for a, b in ((0, 1), (1, 2), (2, 0)):
        lap[f[:, a], f[:, b]] = -1
        lap[f[:, b], f[:, a]] = -1
    np.fill_diagonal(lap, -lap.sum(1))
    d = np.maximum(np.diag(lap), 1e-8)
    return lap / d[:, None]


def laplacian_loss(pred: jnp.ndarray, lap: jnp.ndarray) -> jnp.ndarray:
    smoothed = jnp.einsum("vu,buc->bvc", lap, pred)
    return jnp.sum(smoothed ** 2, -1).mean()


def pose2mesh_losses(mesh_pred, mesh_gt, pose3d_pred, pose3d_gt,
                     joints_from_mesh_pred=None, joints_from_mesh_gt=None,
                     faces: Optional[np.ndarray] = None,
                     normal_weight: float = 0.1,
                     edge_weight: float = 20.0) -> Dict[str, jnp.ndarray]:
    """The get_loss bundle (loss.py:get_loss): coord L1 on mesh + lifted 3D
    pose (+ regressed joints), normal and edge regularizers."""
    losses = {
        "mesh_coord": coord_l1(mesh_pred, mesh_gt),
        "pose_coord": coord_l1(pose3d_pred, pose3d_gt),
    }
    if joints_from_mesh_pred is not None:
        losses["joint_coord"] = coord_l1(joints_from_mesh_pred,
                                         joints_from_mesh_gt)
    if faces is not None:
        losses["normal"] = normal_vector_loss(mesh_pred, mesh_gt,
                                              faces) * normal_weight
        losses["edge"] = edge_length_loss(mesh_pred, mesh_gt,
                                          faces) * edge_weight
    losses["total_loss"] = sum(losses.values())
    return losses
