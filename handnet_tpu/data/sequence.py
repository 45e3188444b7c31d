"""Multi-camera sequence loader with ON-DEVICE depth deprojection.

Reference: dex-ycb-toolkit SequenceLoader (sequence_loader.py:20-559) — a
torch-CUDA loader that deprojects the depth maps of all 8 cameras into
masked world-frame point clouds per frame
(_deproject_depth_and_filter_points:304).

TPU redesign: the deprojection is one jitted einsum pipeline over all
cameras at once — [C, H, W] depth -> [C, H*W, 3] world points + masks — with
the per-camera inverse intrinsics and extrinsics baked as constants. Host
side only decodes PNGs.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnums=(3,))
def deproject_depth(depth_m: jnp.ndarray, inv_k: jnp.ndarray,
                    cam_to_world: jnp.ndarray, filter_z: float = 1e-3
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[C, H, W] metric depth -> ([C, H*W, 3] world points, [C, H*W] mask).

    inv_k: [C, 3, 3] inverse intrinsics; cam_to_world: [C, 4, 4].
    """
    c, h, w = depth_m.shape
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")
    ones = jnp.ones_like(grid_x)
    pix = jnp.stack([grid_x, grid_y, ones], axis=-1).reshape(-1, 3)  # [HW, 3]

    rays = jnp.einsum("cij,nj->cni", inv_k, pix)                # [C, HW, 3]
    pts_cam = rays * depth_m.reshape(c, -1, 1)
    pts_h = jnp.concatenate(
        [pts_cam, jnp.ones((c, pts_cam.shape[1], 1), pts_cam.dtype)], axis=-1)
    pts_world = jnp.einsum("cij,cnj->cni", cam_to_world, pts_h)[..., :3]
    mask = depth_m.reshape(c, -1) > filter_z
    return pts_world, mask


def load_extrinsics(dex_ycb_dir: str, extrinsics_name: str,
                    serials: List[str]) -> List[np.ndarray]:
    """Read calibration/extrinsics_<name>/extrinsics.yml into 4x4
    cam->world transforms per serial (sequence_loader.py:86-99 layout:
    12 row-major numbers per camera)."""
    import yaml

    path = os.path.join(dex_ycb_dir, "calibration",
                        f"extrinsics_{extrinsics_name}", "extrinsics.yml")
    with open(path) as f:
        extr = yaml.safe_load(f)["extrinsics"]
    out = []
    for s in serials:
        t34 = np.asarray(extr[s], np.float32).reshape(3, 4)
        t44 = np.eye(4, dtype=np.float32)
        t44[:3] = t34
        out.append(t44)
    return out


def sequence_loader_from_meta(dex_ycb_dir: str, sequence: str,
                              serials: List[str]) -> "SequenceLoader":
    """Build a SequenceLoader straight from a sequence's meta.yml +
    calibration tree (the reference ctor path, sequence_loader.py:40-99)."""
    import yaml

    seq_dir = os.path.join(dex_ycb_dir, sequence)
    with open(os.path.join(seq_dir, "meta.yml")) as f:
        meta = yaml.safe_load(f)
    intrinsics = []
    for s in serials:
        with open(os.path.join(dex_ycb_dir, "calibration", "intrinsics",
                               f"{s}_640x480.yml")) as f:
            intrinsics.append(yaml.safe_load(f)["color"])
    extrinsics = load_extrinsics(dex_ycb_dir, meta["extrinsics"], serials)
    return SequenceLoader(seq_dir, serials, intrinsics, extrinsics)


class SequenceLoader:
    """Frame loader over one DexYCB sequence directory across its cameras."""

    def __init__(self, sequence_dir: str, serials: List[str],
                 intrinsics: List[Dict],
                 extrinsics: Optional[List[np.ndarray]] = None):
        self.sequence_dir = sequence_dir
        self.serials = serials
        inv_k = []
        for intr in intrinsics:
            k = np.array([[intr["fx"], 0, intr["ppx"]],
                          [0, intr["fy"], intr["ppy"]],
                          [0, 0, 1]], np.float32)
            inv_k.append(np.linalg.inv(k))
        self.inv_k = jnp.asarray(np.stack(inv_k))
        if extrinsics is None:
            extrinsics = [np.eye(4, dtype=np.float32) for _ in serials]
        self.cam_to_world = jnp.asarray(np.stack(extrinsics).astype(np.float32))

        probe = os.path.join(sequence_dir, serials[0])
        self.num_frames = len([f for f in os.listdir(probe)
                               if f.startswith("aligned_depth")])

    def depth_frames(self, frame: int) -> np.ndarray:
        import cv2

        depths = []
        for s in self.serials:
            path = os.path.join(self.sequence_dir, s,
                                f"aligned_depth_to_color_{frame:06d}.png")
            depths.append(cv2.imread(path, cv2.IMREAD_ANYDEPTH)
                          .astype(np.float32) / 1000.0)
        return np.stack(depths)

    def points(self, frame: int):
        """World-frame point clouds for all cameras of one frame."""
        depth = jnp.asarray(self.depth_frames(frame))
        return deproject_depth(depth, self.inv_k, self.cam_to_world)
