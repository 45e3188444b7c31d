"""Dense joint-offset field encode/decode (auxiliary representation).

Reference: utils/feature_tool.py:10-65 (FeatureModule.joint2offset /
offset2joint_softmax) — encodes joints as per-pixel unit offset vectors +
closeness heatmaps over the (normalized) depth crop, and decodes them back
with a softmax-weighted vote. Utility representation (unused on the main
path but part of the toolkit surface); batched jnp, NHWC-free (fields are
``[B, J, ...]`` channel groups like the reference).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _mesh_coords(feature_size: int, dtype=jnp.float32):
    r = (2.0 * (jnp.arange(feature_size, dtype=dtype) + 0.5)
         / feature_size - 1.0)
    mesh_x = jnp.broadcast_to(r[None, :], (feature_size, feature_size))
    mesh_y = jnp.broadcast_to(r[:, None], (feature_size, feature_size))
    return mesh_x, mesh_y


def _resize_nearest(img: jnp.ndarray, size: int) -> jnp.ndarray:
    h, w = img.shape[-2], img.shape[-1]
    ys = (jnp.arange(size) * h) // size
    xs = (jnp.arange(size) * w) // size
    return img[..., ys[:, None], xs[None, :]]


@partial(jax.jit, static_argnums=(2, 3))
def joint2offset(jt_uvd: jnp.ndarray, img: jnp.ndarray, kernel_size: float,
                 feature_size: int) -> jnp.ndarray:
    """joints ``[B, J, 3]`` (normalized coords) + depth ``[B, 1, H, W]`` ->
    field ``[B, J*4, F, F]`` (3 unit-offset channels + 1 heatmap per joint)."""
    b, j, _ = jt_uvd.shape
    img_r = _resize_nearest(img, feature_size)             # [B, 1, F, F]
    mesh_x, mesh_y = _mesh_coords(feature_size, jt_uvd.dtype)
    coords = jnp.stack([mesh_x, mesh_y], 0)[None]          # [1, 2, F, F]
    coords = jnp.broadcast_to(coords, (b, 2, feature_size, feature_size))
    coords3 = jnp.concatenate([coords, img_r], 1)          # [B, 3, F, F]

    offset = (jt_uvd[:, :, :, None, None]
              - coords3[:, None, :, :, :])                 # [B, J, 3, F, F]
    dis = jnp.sqrt(jnp.sum(offset ** 2, axis=2) + 1e-8)    # [B, J, F, F]
    offset_norm = offset / dis[:, :, None]
    heatmap = (kernel_size - dis) / kernel_size
    mask = (heatmap >= 0) & (img_r < 0.99)                 # [B, J, F, F]
    offset_masked = (offset_norm * mask[:, :, None]).reshape(
        b, j * 3, feature_size, feature_size)
    heatmap_masked = heatmap * mask
    return jnp.concatenate([offset_masked, heatmap_masked], axis=1)


@partial(jax.jit, static_argnums=(2,))
def offset2joint_softmax(offset: jnp.ndarray, img: jnp.ndarray,
                         kernel_size: float) -> jnp.ndarray:
    """Inverse decode: field ``[B, J*4, F, F]`` -> joints ``[B, J, 3]``."""
    b, feature_num, f, _ = offset.shape
    j = feature_num // 4
    img_r = _resize_nearest(img, f)
    vec = offset[:, :j * 3].reshape(b, j, 3, -1)
    ht = offset[:, j * 3:].reshape(b, j, -1)

    mesh_x, mesh_y = _mesh_coords(f, offset.dtype)
    coords = jnp.stack([mesh_x, mesh_y], 0)[None]
    coords = jnp.broadcast_to(coords, (b, 2, f, f))
    coords3 = jnp.concatenate([coords, img_r], 1)[:, None].repeat(j, 1)
    coords3 = coords3.reshape(b, j, 3, -1)

    mask = (img_r < 0.99).reshape(b, 1, -1)
    vec = vec * mask[:, :, None]
    ht = ht * mask
    weights = jax.nn.softmax(ht * 30.0, axis=-1)
    dis = kernel_size - ht * kernel_size
    return jnp.sum((vec * dis[:, :, None] + coords3) * weights[:, :, None],
                   axis=-1)
