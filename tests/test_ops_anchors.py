"""Anchor grids vs the reference construction (a2j/anchor.py:7-42,
fcos_utils/anchor_utils.py:56-112) — compared as *sets*, since the flat order
is an internal convention (the A2J aggregation is order-invariant)."""

import numpy as np

from handnet_tpu.ops.anchors import (a2j_anchor_grid, fcos_anchor_pyramid,
                                     fcos_level_anchors)


def reference_a2j_anchors(shape, stride, P=(2, 6, 10, 14)):
    """Independent numpy re-derivation of the reference anchor set
    (a2j/anchor.py:7-42): offsets {P x P} shifted over the stride grid."""
    out = []
    for h in range(shape[0]):
        for w in range(shape[1]):
            for pi in P:
                for pj in P:
                    out.append((pi + stride * h, pj + stride * w))
    return np.array(sorted(out))


def test_a2j_anchor_set_matches_reference():
    ours = a2j_anchor_grid(11, 11, 16)
    assert ours.shape == (11 * 11 * 16, 2)  # 1936 anchors (SURVEY §2.2)
    ref = reference_a2j_anchors((11, 11), 16)
    ours_sorted = np.array(sorted(map(tuple, ours[:, ::-1])))  # (v,u) to match
    np.testing.assert_allclose(ours_sorted, ref)


def test_a2j_anchor_pairing_convention():
    # flat index k = ((h*W + w)*A + a), a = i*4 + j, u = w*stride + offs[j]
    ours = a2j_anchor_grid(2, 3, 16, offsets=(2, 6))
    # k for h=1, w=2, i=1, j=0 -> ((1*3+2)*4 + 2) = 22
    np.testing.assert_allclose(ours[22], [2 * 16 + 2, 1 * 16 + 6])


def test_a2j_transposed_mode_swaps_uv():
    a = a2j_anchor_grid(2, 3, 16, offsets=(2, 6), transposed=False)
    b = a2j_anchor_grid(2, 3, 16, offsets=(2, 6), transposed=True)
    np.testing.assert_allclose(a, b[:, ::-1])


def test_fcos_level_anchors():
    a = fcos_level_anchors(2, 2, stride=8, size=8)
    # cell (0,0): centered at origin, +-4
    np.testing.assert_allclose(a[0], [-4, -4, 4, 4])
    # cell (1,1): centered at (8, 8)
    np.testing.assert_allclose(a[3], [4, 4, 12, 12])


def test_fcos_pyramid_counts():
    anchors, sizes, slices = fcos_anchor_pyramid(64, 96, strides=(8, 16, 32))
    assert anchors.shape[0] == 8 * 12 + 4 * 6 + 2 * 3
    assert slices[0][1] == 96 and slices[1][1] == 24 and slices[2][1] == 6
    assert (sizes[:96] == 8).all() and (sizes[-6:] == 32).all()
