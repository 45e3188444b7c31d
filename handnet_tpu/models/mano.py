"""MANO hand model (LBS) in JAX — batched, jit/vmap/grad-friendly.

Reference: manopth/manolayer.py:13-274. The math is identical (PCA pose
coeffs -> axis-angle -> rotmats -> shape/pose blendshapes -> 3-level kinematic
chain x 5 fingers -> linear blend skinning -> 778 verts + 21 joints in mm);
the implementation is one batched einsum pipeline with no python state —
the TPU version serves both label generation (datasets3d/a2jdataset.py:189-196)
and the mesh demo.

Model assets load from an ``.npz`` produced by convert/mano_assets.py
(the chumpy-free MANO_{LEFT,RIGHT}.pkl converter); no chumpy at runtime.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from handnet_tpu.ops.rotation import batch_rodrigues

# finger-tip vertex ids appended as joints 16..20 (manolayer.py:250-253)
TIPS_RIGHT = (745, 317, 444, 556, 673)
TIPS_LEFT = (745, 317, 445, 556, 673)
# kinematic-chain order -> visualization order (manolayer.py:260)
JOINT_REORDER = (0, 13, 14, 15, 16, 1, 2, 3, 17, 4, 5, 6, 18,
                 10, 11, 12, 19, 7, 8, 9, 20)
# transforms concat [root, lev1 x5, lev2 x5, lev3 x5] -> per-finger chains
# (manolayer.py:228)
TRANSFORM_REORDER = (0, 1, 6, 11, 2, 7, 12, 3, 8, 13, 4, 9, 14, 5, 10, 15)
LEV1 = (1, 4, 7, 10, 13)
LEV2 = (2, 5, 8, 11, 14)
LEV3 = (3, 6, 9, 12, 15)


@dataclass(frozen=True)
class ManoAssets:
    """Static MANO model tensors (from MANO_{side}.pkl via the converter)."""

    v_template: np.ndarray      # [778, 3]
    shapedirs: np.ndarray       # [778, 3, 10]
    posedirs: np.ndarray        # [778, 3, 135]
    J_regressor: np.ndarray     # [16, 778]
    weights: np.ndarray         # [778, 16] skinning weights
    hands_components: np.ndarray  # [45, 45] PCA basis
    hands_mean: np.ndarray      # [45]
    faces: np.ndarray           # [1538, 3] int
    side: str = "right"

    @classmethod
    def load(cls, path: str, side: str = "right") -> "ManoAssets":
        data = np.load(path, allow_pickle=False)
        return cls(
            v_template=data["v_template"].astype(np.float32),
            shapedirs=data["shapedirs"].astype(np.float32),
            posedirs=data["posedirs"].astype(np.float32),
            J_regressor=data["J_regressor"].astype(np.float32),
            weights=data["weights"].astype(np.float32),
            hands_components=data["hands_components"].astype(np.float32),
            hands_mean=data["hands_mean"].astype(np.float32),
            faces=data["faces"].astype(np.int32),
            side=side,
        )

    @classmethod
    def synthetic(cls, rng: np.random.Generator, n_verts: int = 778,
                  side: str = "right") -> "ManoAssets":
        """Random plausible assets for tests (no licensed MANO files needed)."""
        v = rng.normal(size=(n_verts, 3)).astype(np.float32) * 0.05
        jr = np.abs(rng.normal(size=(16, n_verts)).astype(np.float32))
        jr = jr / jr.sum(axis=1, keepdims=True)
        w = np.abs(rng.normal(size=(n_verts, 16)).astype(np.float32))
        w = w / w.sum(axis=1, keepdims=True)
        return cls(
            v_template=v,
            shapedirs=rng.normal(size=(n_verts, 3, 10)).astype(np.float32) * 0.01,
            posedirs=rng.normal(size=(n_verts, 3, 135)).astype(np.float32) * 0.001,
            J_regressor=jr,
            weights=w,
            hands_components=np.eye(45, dtype=np.float32),
            hands_mean=np.zeros(45, np.float32),
            faces=np.zeros((4, 3), np.int32),
            side=side,
        )


def _with_zeros(rot_trans: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 4] -> [..., 4, 4] homogeneous (tensutils.th_with_zeros)."""
    pad = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], rot_trans.dtype),
        rot_trans.shape[:-2] + (1, 4))
    return jnp.concatenate([rot_trans, pad], axis=-2)


class ManoLayer:
    """Functional MANO forward.

    forward(pose_coeffs[B, 3+ncomps], betas[B, 10], trans[B, 3])
      -> (verts[B, 778, 3], joints[B, 21, 3]) in millimeters.

    Matches manolayer.py:110-274 with use_pca, axis-angle root. When
    ``flat_hand_mean=False`` the PCA pose is offset by ``hands_mean``.
    """

    def __init__(self, assets: ManoAssets, ncomps: int = 45,
                 flat_hand_mean: bool = False, use_pca: bool = True,
                 center_idx: Optional[int] = None):
        self.assets = assets
        self.ncomps = ncomps
        self.use_pca = use_pca
        self.center_idx = center_idx
        self.side = assets.side
        self.faces = assets.faces

        self._shapedirs = jnp.asarray(assets.shapedirs)
        self._posedirs = jnp.asarray(assets.posedirs)
        self._v_template = jnp.asarray(assets.v_template)
        self._J_regressor = jnp.asarray(assets.J_regressor)
        self._weights = jnp.asarray(assets.weights)
        self._comps = jnp.asarray(assets.hands_components[:ncomps])
        mean = (np.zeros_like(assets.hands_mean) if flat_hand_mean
                else assets.hands_mean)
        self._hands_mean = jnp.asarray(mean)
        self._tips = TIPS_RIGHT if assets.side == "right" else TIPS_LEFT

    def __call__(self, pose_coeffs: jnp.ndarray,
                 betas: Optional[jnp.ndarray] = None,
                 trans: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b = pose_coeffs.shape[0]

        # PCA coeffs -> full 45-dim axis-angle hand pose (manolayer.py:129-143)
        hand_coeffs = pose_coeffs[:, 3:3 + self.ncomps]
        if self.use_pca:
            full_hand_pose = hand_coeffs @ self._comps
        else:
            full_hand_pose = hand_coeffs
        full_pose = jnp.concatenate(
            [pose_coeffs[:, :3], self._hands_mean + full_hand_pose], axis=1)

        # rotmats for all 16 segments; pose blendshape basis excludes root
        rot_mats = batch_rodrigues(full_pose.reshape(b, 16, 3))  # [B,16,3,3]
        root_rot = rot_mats[:, 0]
        pose_map = (rot_mats[:, 1:]
                    - jnp.eye(3, dtype=rot_mats.dtype)).reshape(b, 135)

        # shape blendshapes (manolayer.py:171-184)
        if betas is None:
            v_shaped = self._v_template[None]
            v_shaped = jnp.broadcast_to(v_shaped, (b,) + v_shaped.shape[1:])
        else:
            v_shaped = (jnp.einsum("vcs,bs->bvc", self._shapedirs, betas)
                        + self._v_template[None])
        joints_rest = jnp.einsum("jv,bvc->bjc", self._J_regressor, v_shaped)

        # pose blendshapes (manolayer.py:187-188)
        v_posed = v_shaped + jnp.einsum("vcp,bp->bvc", self._posedirs, pose_map)

        # kinematic chain: root + 3 levels x 5 fingers (manolayer.py:193-230)
        root_j = joints_rest[:, 0:1]                              # [B,1,3]
        root_tf = _with_zeros(
            jnp.concatenate([root_rot, root_j.swapaxes(1, 2)], axis=2))

        def level_tf(parent_tf, rots, j_rel):
            local = _with_zeros(
                jnp.concatenate([rots, j_rel[..., None]], axis=-1))
            return jnp.einsum("bfij,bfjk->bfik", parent_tf, local)

        all_rots = rot_mats[:, 1:]                                # [B,15,3,3]
        lev1_rots = all_rots[:, [i - 1 for i in LEV1]]
        lev2_rots = all_rots[:, [i - 1 for i in LEV2]]
        lev3_rots = all_rots[:, [i - 1 for i in LEV3]]
        lev1_j = joints_rest[:, list(LEV1)]
        lev2_j = joints_rest[:, list(LEV2)]
        lev3_j = joints_rest[:, list(LEV3)]

        root_rep = jnp.broadcast_to(root_tf[:, None], (b, 5, 4, 4))
        lev1_tf = level_tf(root_rep, lev1_rots, lev1_j - root_j)
        lev2_tf = level_tf(lev1_tf, lev2_rots, lev2_j - lev1_j)
        lev3_tf = level_tf(lev2_tf, lev3_rots, lev3_j - lev2_j)

        transforms = jnp.concatenate(
            [root_tf[:, None], lev1_tf, lev2_tf, lev3_tf], axis=1)
        transforms = transforms[:, list(TRANSFORM_REORDER)]       # [B,16,4,4]

        # inverse-bind: subtract transformed rest-joint translation
        # (manolayer.py:232-234)
        joint_h = jnp.concatenate(
            [joints_rest, jnp.zeros((b, 16, 1), joints_rest.dtype)], axis=2)
        tmp = jnp.einsum("bjik,bjk->bji", transforms, joint_h)    # [B,16,4]
        rel = transforms - jnp.concatenate(
            [jnp.zeros((b, 16, 4, 3), transforms.dtype), tmp[..., None]],
            axis=3)

        # LBS (manolayer.py:236-246)
        T = jnp.einsum("bjik,vj->bvik", rel, self._weights)       # [B,V,4,4]
        v_posed_h = jnp.concatenate(
            [v_posed, jnp.ones((b, v_posed.shape[1], 1), v_posed.dtype)],
            axis=2)
        verts = jnp.einsum("bvik,bvk->bvi", T, v_posed_h)[..., :3]
        joints = transforms[:, :, :3, 3]                          # [B,16,3]

        # fingertips + reorder (manolayer.py:250-260)
        tips = verts[:, list(self._tips)]
        joints = jnp.concatenate([joints, tips], axis=1)
        joints = joints[:, list(JOINT_REORDER)]

        if trans is not None:
            joints = joints + trans[:, None]
            verts = verts + trans[:, None]
        elif self.center_idx is not None:
            center = joints[:, self.center_idx:self.center_idx + 1]
            joints = joints - center
            verts = verts - center

        return verts * 1000.0, joints * 1000.0
