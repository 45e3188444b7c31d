"""Batched rotation math (axis-angle -> rotation matrices, 6D rot).

Reference: manopth/rodrigues_layer.py (quaternion-based batch Rodrigues,
:44-55) and manopth/rot6d.py. Implemented as pure jnp; fully batched.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_to_rotmat(quat: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (w, x, y, z) -> [..., 3, 3]."""
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    w, x, y, z = (quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3])
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack([
        w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
        2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
        2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
    ], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def batch_rodrigues(axisang: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] axis-angle -> [..., 3, 3] rotations.

    Uses the same quaternion construction (and the +1e-8 norm guard) as the
    reference (rodrigues_layer.py:44-55) so converted poses match bit-close.
    """
    angle = jnp.linalg.norm(axisang + 1e-8, axis=-1, keepdims=True)
    axis = axisang / angle
    half = angle * 0.5
    quat = jnp.concatenate([jnp.cos(half), jnp.sin(half) * axis], axis=-1)
    return quat_to_rotmat(quat)


def rot6d_to_rotmat(x: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] continuous 6D rotation -> [..., 3, 3] (Zhou et al., the
    rot6d.py:compute_rotation_matrix_from_ortho6d equivalent)."""
    a1 = x[..., 0:3]
    a2 = x[..., 3:6]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2).swapaxes(-1, -2)
