"""Camera geometry + joint-space conversions, batched and jit-friendly.

TPU-native equivalents of:
* ``xyz2uvd`` / ``uvd2xyz`` pinhole (un)projection — reference datasets3d/a2jdataset.py:21-38
* ``convert_joints`` crop-UVD -> full-image UV -> XYZ(mm) — reference a2j/a2j.py:17-43
* Procrustes ``align_w_scale`` — reference dex-ycb-toolkit/freihand/eval.py:71-94

The reference runs convert_joints per-sample in numpy on the host
(a2j/a2j.py:341-348); here the whole metric path stays batched on device.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def xyz2uvd(pts: jnp.ndarray, paras: jnp.ndarray) -> jnp.ndarray:
    """Project camera-frame XYZ to pixel UVD. ``paras = [fx, fy, cx, cy]``.

    Batched over arbitrary leading dims; pts ``[..., 3]``, paras ``[..., 4]``
    broadcastable against pts' leading dims.
    """
    f = paras[..., None, 0:2]
    c = paras[..., None, 2:4]
    uv = pts[..., 0:2] * f / pts[..., 2:3] + c
    return jnp.concatenate([uv, pts[..., 2:3]], axis=-1)


def uvd2xyz(pts: jnp.ndarray, paras: jnp.ndarray) -> jnp.ndarray:
    """Unproject pixel UVD to camera-frame XYZ (inverse of :func:`xyz2uvd`)."""
    f = paras[..., None, 0:2]
    c = paras[..., None, 2:4]
    xy = (pts[..., 0:2] - c) * pts[..., 2:3] / f
    return jnp.concatenate([xy, pts[..., 2:3]], axis=-1)


def crop_uvd_to_image_uvd(jt_uvd: jnp.ndarray, box: jnp.ndarray,
                          crop_w: int, crop_h: int) -> jnp.ndarray:
    """Map crop-frame UVD back to full-image UVD given the crop box.

    Mirrors a2j/a2j.py:25-30: u' = u * (x2-x1)/crop_w + x1 (likewise for v);
    depth passes through.
    """
    x1 = box[..., None, 0]
    y1 = box[..., None, 1]
    x2 = box[..., None, 2]
    y2 = box[..., None, 3]
    u = jt_uvd[..., 0] * (x2 - x1) / crop_w + x1
    v = jt_uvd[..., 1] * (y2 - y1) / crop_h + y1
    return jnp.stack([u, v, jt_uvd[..., 2]], axis=-1)


def convert_joints(jt_uvd: jnp.ndarray, box: jnp.ndarray, paras: jnp.ndarray,
                   crop_w: int = 176, crop_h: int = 176) -> jnp.ndarray:
    """Crop UVD -> XYZ in millimeters (reference a2j/a2j.py:17-43).

    Fully batched: jt_uvd ``[..., J, 3]``, box ``[..., 4]``, paras ``[..., 4]``.
    """
    img_uvd = crop_uvd_to_image_uvd(jt_uvd, box, crop_w, crop_h)
    return uvd2xyz(img_uvd, paras) * 1000.0


# ---------------------------------------------------------------------------
# Procrustes alignment with scale (numpy — evaluation-side, matches scipy's
# orthogonal_procrustes as used by freihand/eval.py:71-94).


def orthogonal_procrustes_np(a: np.ndarray, b: np.ndarray):
    """R, s minimizing ||a @ R.T * ? - b|| as scipy.linalg.orthogonal_procrustes.

    Returns R (orthogonal) and s = sum of singular values of b.T @ a, matching
    scipy's convention where ``b @ R`` approximates ``a`` scaled.
    """
    u, w, vt = np.linalg.svd(b.T.dot(a).T)
    r = u.dot(vt)
    scale = w.sum()
    return r, scale


def align_w_scale_np(mtx1: np.ndarray, mtx2: np.ndarray,
                     return_trafo: bool = False):
    """Similarity-align ``mtx2`` (pred) to ``mtx1`` (GT) — freihand/eval.py:71-94."""
    t1 = mtx1.mean(0)
    t2 = mtx2.mean(0)
    mtx1_t = mtx1 - t1
    mtx2_t = mtx2 - t2

    s1 = np.linalg.norm(mtx1_t) + 1e-8
    mtx1_t = mtx1_t / s1
    s2 = np.linalg.norm(mtx2_t) + 1e-8
    mtx2_t = mtx2_t / s2

    r, s = orthogonal_procrustes_np(mtx1_t, mtx2_t)
    mtx2_t = np.dot(mtx2_t, r.T) * s
    mtx2_t = mtx2_t * s1 + t1
    if return_trafo:
        return r, s, s1, t1 - t2
    return mtx2_t


def align_w_scale(mtx1: jnp.ndarray, mtx2: jnp.ndarray) -> jnp.ndarray:
    """Batched on-device Procrustes+scale alignment ``[..., N, 3]``.

    Device-side version so the whole HPE metric sweep can run as one jitted
    batch instead of the reference's per-sample host loop (hpe_eval.py:202-211).
    """
    t1 = mtx1.mean(axis=-2, keepdims=True)
    t2 = mtx2.mean(axis=-2, keepdims=True)
    a = mtx1 - t1
    b = mtx2 - t2
    s1 = jnp.linalg.norm(a, axis=(-2, -1), keepdims=True) + 1e-8
    s2 = jnp.linalg.norm(b, axis=(-2, -1), keepdims=True) + 1e-8
    a = a / s1
    b = b / s2
    # R, s from SVD of (b^T a)^T = a^T b
    m = jnp.swapaxes(jnp.matmul(jnp.swapaxes(b, -1, -2), a), -1, -2)
    u, w, vt = jnp.linalg.svd(m)
    r = jnp.matmul(u, vt)
    s = w.sum(axis=-1)[..., None, None]
    out = jnp.matmul(b, jnp.swapaxes(r, -1, -2)) * s
    return out * s1 + t1
