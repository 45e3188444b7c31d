"""Pose2Mesh: 2D joints -> 3D joints (MLP lifter) -> 778-vertex MANO mesh
(coarse-to-fine Chebyshev GCN).

Reference: pose2mesh/lib/models/pose2mesh_net.py:8-28 (FlatPose2Mesh),
posenet.py:41-98 (residual MLP 42->4096->...->63), meshnet.py:11-117
(7-block GCN over the coarse-to-fine mesh pyramid), and
backbones/cheby_graph_conv.py:5-42 (K-order Chebyshev recurrence with
torch.sparse.mm).

TPU-native redesign:
* Chebyshev recurrence uses **dense** Laplacian matmuls — every graph is
  <= ~1100 nodes, so the MXU eats `L @ X` whole; no sparse gather/scatter.
* All blocks are batched einsums; upsampling is a reshape-repeat (the
  binary-tree node ordering makes 2x graph upsampling a free reshape).
* The residual "feature interpolate" (meshnet.py:109-113 F.interpolate over
  the channel dim) is reproduced exactly as a linear resample matrix baked at
  init — static shapes, one matmul.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from handnet_tpu.config import Pose2MeshConfig
from handnet_tpu.ops.graph import GraphPyramid


class ResidualLinearBlock(nn.Module):
    """BN -> ReLU -> Dropout -> Linear, twice, with skip (posenet.py:41-66)."""

    size: int
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn1")(x)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(self.size, dtype=self.dtype, name="w1")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn2")(y)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(self.size, dtype=self.dtype, name="w2")(y)
        return x + y


class PoseNet(nn.Module):
    """2D->3D joint lifter (posenet.py:69-110): 2J -> hid -> (res x stages)
    -> 3J."""

    num_joints: int = 21
    hid: int = 4096
    stages: int = 2
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pose2d, train: bool = False):
        b = pose2d.shape[0]
        x = pose2d.reshape(b, -1)
        x = nn.Dense(self.hid, dtype=self.dtype, name="w1")(x)
        for i in range(self.stages):
            x = ResidualLinearBlock(self.hid, self.dropout, self.dtype,
                                    name=f"stage{i}")(x, train=train)
        x = nn.Dense(self.num_joints * 3, dtype=self.dtype, name="w2")(x)
        return x.reshape(b, self.num_joints, 3)


def cheby_conv(x: jnp.ndarray, L: jnp.ndarray, weight: jnp.ndarray,
               bias: jnp.ndarray, k: int) -> jnp.ndarray:
    """K-order Chebyshev graph convolution, dense (cheby_graph_conv.py:5-42).

    x ``[B, V, Fin]``, L ``[V, V]`` rescaled Laplacian, weight
    ``[K*Fin, Fout]`` with the reference's basis-major layout (T_k blocks
    stacked along the input axis).
    """
    terms = [x]
    if k > 1:
        terms.append(jnp.einsum("vu,buf->bvf", L, x))
    for _ in range(2, k):
        terms.append(2.0 * jnp.einsum("vu,buf->bvf", L, terms[-1])
                     - terms[-2])
    # reference layout: view([K, V, Fin, B]) -> permute(B, V, Fin, K) ->
    # reshape(B*V, Fin*K) — i.e. input features vary slowest, k fastest
    stacked = jnp.stack(terms, axis=-1)              # [B, V, Fin, K]
    b, v, fin, kk = stacked.shape
    flat = stacked.reshape(b, v, fin * kk)
    return jnp.einsum("bvi,io->bvo", flat, weight) + bias


class ChebyLayer(nn.Module):
    fout: int
    k: int = 3
    use_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, L, train: bool = False):
        fin = x.shape[-1]
        scale = np.sqrt(2.0 / (self.k * fin + self.fout))

        def symmetric_uniform(key, shape, dtype=jnp.float32):
            # reference's uniform_(-scale, scale) init (meshnet.py:50-52);
            # stored params ARE the effective weights, so converted torch
            # checkpoints load verbatim (convert/torch_weights.py).
            return jax.random.uniform(key, shape, dtype, -scale, scale)

        weight = self.param("kernel", symmetric_uniform,
                            (fin * self.k, self.fout), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.fout,),
                          jnp.float32)
        y = cheby_conv(x, L, weight.astype(self.dtype),
                       bias.astype(self.dtype), self.k)
        if self.use_bn:
            b, v, f = y.shape
            y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                             name="bn")(y.reshape(b * v, f)).reshape(b, v, f)
        return y


def _feature_resize_matrix(fin: int, fout: int) -> np.ndarray:
    """Linear-interpolation matrix over the FEATURE axis, matching
    F.interpolate(mode='linear', align_corners=False) as used for the
    residual connections (meshnet.py:109-113)."""
    m = np.zeros((fin, fout), np.float32)
    scale = fin / fout
    for j in range(fout):
        src = (j + 0.5) * scale - 0.5
        lo = int(np.floor(src))
        w = src - lo
        lo_c = min(max(lo, 0), fin - 1)
        hi_c = min(max(lo + 1, 0), fin - 1)
        m[lo_c, j] += 1.0 - w
        m[hi_c, j] += w
    return m


class MeshNet(nn.Module):
    """Coarse-to-fine Chebyshev GCN (meshnet.py:11-117).

    graph pyramid: laplacians[-1] = 21-joint graph; blocks walk up
    [-1, -2(after del), ...] doubling nodes via binary-tree upsampling.
    """

    pyramid: GraphPyramid
    in_channels: int = 5           # 2D + detached 3D/1000
    out_channels: int = 3
    k: int = 3
    dtype: Any = jnp.float32

    def setup(self):
        # drop the second-coarsest mesh graph (meshnet.py:38: del graph_L[-2])
        laps = list(self.pyramid.laplacians)
        del laps[-2]
        self._laps = [jnp.asarray(l) for l in laps]
        # channel plan (meshnet.py:23-27, mano branch)
        self.block_channels = [
            (self.in_channels, 32, 64, 64),
            (64, 128, 256), (256, 256, 256), (256, 256, 256),
            (256, 256, 256), (256, 128, 128),
            (128, 64, self.out_channels),
        ]
        layers = []
        n_blocks = len(self.block_channels)
        for i, chans in enumerate(self.block_channels):
            for li in range(len(chans) - 1):
                last = (i == n_blocks - 1 and li == len(chans) - 2)
                layers.append(ChebyLayer(chans[li + 1], self.k,
                                         use_bn=not last, dtype=self.dtype,
                                         name=f"cl{len(layers)}"))
        self.layers = layers
        joint_nodes = self._laps[-1].shape[0]
        up_nodes = self._laps[-2].shape[0]
        self.fc = nn.Dense(up_nodes * self.block_channels[1][0],
                           dtype=self.dtype, name="fc")
        self._joint_nodes = joint_nodes
        self._up_nodes = up_nodes

    def __call__(self, x, train: bool = False):
        """x: ``[B, J, in_channels]`` -> ``[B, V_padded, 3]`` mesh (use
        pyramid.perm_reverse[:778] to recover vertex order)."""
        b = x.shape[0]
        n_blocks = len(self.block_channels)
        li = 0
        for i, chans in enumerate(self.block_channels):
            ldx = -(i + 1)
            if i == n_blocks - 1:
                ldx += 1
            L = self._laps[ldx]
            input_x = x
            for layer_i in range(len(chans) - 1):
                x = self.layers[li](x, L, train=train)
                last = (i == n_blocks - 1 and layer_i == len(chans) - 2)
                if not last:
                    x = nn.relu(x)
                li += 1
            if i == 0:
                # joint graph -> first mesh level via FC (meshnet.py:104-106)
                x = self.fc(x.reshape(b, -1))
                x = x.reshape(b, self._up_nodes, self.block_channels[1][0])
            elif i < n_blocks - 2:
                # residual (channel-linear resize) + 2x graph upsample
                rm = jnp.asarray(_feature_resize_matrix(input_x.shape[-1],
                                                        x.shape[-1]))
                x = x + jnp.einsum("bvf,fg->bvg", input_x, rm)
                x = jnp.repeat(x, 2, axis=1)     # binary-tree upsample x2
            elif i == n_blocks - 2:
                rm = jnp.asarray(_feature_resize_matrix(input_x.shape[-1],
                                                        x.shape[-1]))
                x = x + jnp.einsum("bvf,fg->bvg", input_x, rm)
        return x


class Pose2Mesh(nn.Module):
    """FlatPose2Mesh (pose2mesh_net.py:8-28): lifter + GCN; the 3D pose is
    detached and divided by 1000 before concatenation."""

    pyramid: GraphPyramid
    cfg: Pose2MeshConfig = Pose2MeshConfig()
    dtype: Any = jnp.float32

    def setup(self):
        self.pose_lifter = PoseNet(self.cfg.num_joints, self.cfg.posenet_hid,
                                   self.cfg.posenet_stages, self.cfg.dropout,
                                   dtype=self.dtype)
        self.pose2mesh = MeshNet(self.pyramid, in_channels=5,
                                 k=self.cfg.cheby_order, dtype=self.dtype)

    def __call__(self, pose2d, train: bool = False):
        pose3d = self.pose_lifter(pose2d, train=train)
        combined = jnp.concatenate(
            [pose2d, jax.lax.stop_gradient(pose3d) / 1000.0], axis=2)
        mesh = self.pose2mesh(combined, train=train)
        return mesh, pose3d


def normalize_joints_for_pose2mesh_batched(joints2d: jnp.ndarray,
                                           input_shape=(384, 288)
                                           ) -> jnp.ndarray:
    """In-graph batched version of :func:`normalize_joints_for_pose2mesh`
    (``[B, J, 2]`` -> ``[B, J, 2]``): same bbox/aspect/affine/standardize
    semantics with the host branches turned into selects, plus eps guards so
    all-zero (masked "no hand") rows stay finite instead of producing NaNs
    that would poison the found-mask multiply downstream.
    """
    j = joints2d.astype(jnp.float32)
    xmin = j[..., 0].min(axis=-1)
    ymin = j[..., 1].min(axis=-1)
    w = j[..., 0].max(axis=-1) - xmin
    h = j[..., 1].max(axis=-1) - ymin
    w = jnp.where(w > 1, w - 1, w)
    h = jnp.where(h > 1, h - 1, h)
    cx = xmin + w / 2.0
    cy = ymin + h / 2.0
    aspect = input_shape[1] / input_shape[0]
    # only the width of the aspect-fixed box matters: s below is the one
    # isotropic scale, and the final per-axis standardization absorbs offsets
    new_w = jnp.where(w < aspect * h, h * aspect, w)
    dst_w, dst_h = float(input_shape[1]), float(input_shape[0])
    s = dst_w / jnp.maximum(new_w, 1e-4)
    u = ((j[..., 0] - cx[..., None]) * s[..., None] + dst_w / 2.0) / dst_w
    v = ((j[..., 1] - cy[..., None]) * s[..., None] + dst_h / 2.0) / dst_h
    out = jnp.stack([u, v], axis=-1)
    mean = out.mean(axis=-2, keepdims=True)
    std = out.std(axis=-2, keepdims=True)
    return (out - mean) / (std + 1e-8)


def normalize_joints_for_pose2mesh(joints2d: np.ndarray,
                                   input_shape=(384, 288)) -> np.ndarray:
    """The demo-side 2D-joint normalization (ros_demo.py:148-160 predict_mesh):
    bbox from joints -> aspect-fixed box -> affine to the model input frame ->
    scale to [0,1] -> standardize by mean/std over joints."""
    j = np.asarray(joints2d, np.float64)
    xmin, ymin = j[:, 0].min(), j[:, 1].min()
    xmax, ymax = j[:, 0].max(), j[:, 1].max()
    # process_bbox aspect fix (coord_utils.py:42-67)
    w = xmax - xmin
    h = ymax - ymin
    x1, y1 = xmin, ymin
    w = w - 1 if w > 1 else w
    h = h - 1 if h > 1 else h
    cx, cy = x1 + w / 2.0, y1 + h / 2.0
    aspect = input_shape[1] / input_shape[0]
    if w > aspect * h:
        h = w / aspect
    elif w < aspect * h:
        w = h * aspect
    # affine: center -> input center, scale w -> input_w (aug_utils.py:140-173
    # with rot=0)
    dst_w, dst_h = input_shape[1], input_shape[0]
    s = dst_w / w
    out = np.empty_like(j)
    out[:, 0] = (j[:, 0] - cx) * s + dst_w / 2.0
    out[:, 1] = (j[:, 1] - cy) * s + dst_h / 2.0
    out /= np.array([[dst_w, dst_h]])
    mean = out.mean(axis=0)
    std = out.std(axis=0)
    return ((out - mean) / std).astype(np.float32)
