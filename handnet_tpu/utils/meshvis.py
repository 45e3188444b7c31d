"""Host-side mesh/skeleton visualization without a GL stack.

Reference equivalents: utils/visualize/displaymano.py (matplotlib hand mesh
plots) and the pyrender offscreen path of ros_demo.py:51-128. We provide:

* ``project_mesh`` — camera projection of mesh vertices,
* ``draw_mesh_wireframe`` — cv2 polyline rendering of the projected faces,
* ``depth_colormap`` — depth image to displayable color map.

True shaded rendering stays out of scope (no GL in the image); wireframe +
skeleton overlays cover the demo/debug use cases.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def project_mesh(verts_mm: np.ndarray, paras: np.ndarray) -> np.ndarray:
    """[V, 3] mm camera-frame -> [V, 2] pixels."""
    v = verts_mm / 1000.0
    u = v[:, 0] * paras[0] / np.maximum(v[:, 2], 1e-6) + paras[2]
    w = v[:, 1] * paras[1] / np.maximum(v[:, 2], 1e-6) + paras[3]
    return np.stack([u, w], axis=1)


def draw_mesh_wireframe(image: np.ndarray, verts_mm: np.ndarray,
                        faces: np.ndarray, paras: np.ndarray,
                        color: Tuple[int, int, int] = (0, 200, 0),
                        max_faces: int = 600) -> np.ndarray:
    """Overlay a wireframe of (subsampled) mesh faces on a BGR image."""
    import cv2

    out = np.ascontiguousarray(image.copy())
    uv = project_mesh(verts_mm, paras).astype(np.int32)
    h, w = image.shape[:2]
    step = max(1, len(faces) // max_faces)
    for f in faces[::step]:
        pts = uv[f]
        if ((pts[:, 0] < 0) | (pts[:, 0] >= w)
                | (pts[:, 1] < 0) | (pts[:, 1] >= h)).any():
            continue
        cv2.polylines(out, [pts.reshape(-1, 1, 2)], True, color, 1)
    return out


def depth_colormap(depth_m: np.ndarray, max_depth: float = 2.0) -> np.ndarray:
    """Depth in meters -> BGR colormap image."""
    import cv2

    norm = np.clip(depth_m / max_depth, 0, 1)
    return cv2.applyColorMap((norm * 255).astype(np.uint8), cv2.COLORMAP_JET)
