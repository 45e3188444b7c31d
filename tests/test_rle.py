"""RLE mask kernel tests: roundtrips, bbox/area/iou vs dense-mask oracles,
C++ vs numpy-fallback agreement, COCO string codec roundtrip."""

import numpy as np
import pytest

from handnet_tpu.data import rle as R


def random_mask(rng, h=48, w=64, blobs=3):
    m = np.zeros((h, w), np.uint8)
    for _ in range(blobs):
        y, x = rng.integers(0, h - 8), rng.integers(0, w - 8)
        hh, ww = rng.integers(2, 10), rng.integers(2, 10)
        m[y:y + hh, x:x + ww] = 1
    return m


def test_cpp_kernel_builds():
    assert R._build_lib() is not None, "C++ RLE kernel failed to build"


def test_encode_decode_roundtrip(rng):
    for _ in range(10):
        m = random_mask(rng)
        rle = R.encode(m)
        back = R.decode(rle)
        np.testing.assert_array_equal(back, m)


def test_empty_and_full_masks():
    for m in (np.zeros((10, 12), np.uint8), np.ones((10, 12), np.uint8)):
        np.testing.assert_array_equal(R.decode(R.encode(m)), m)
    assert R.area(R.encode(np.ones((10, 12), np.uint8))) == 120
    assert R.area(R.encode(np.zeros((10, 12), np.uint8))) == 0


def test_area_matches_sum(rng):
    m = random_mask(rng)
    assert R.area(R.encode(m)) == int(m.sum())


def test_tobbox_matches_nonzero(rng):
    for _ in range(10):
        m = random_mask(rng)
        bbox = R.toBbox(R.encode(m))
        ys, xs = np.nonzero(m)
        if len(xs) == 0:
            np.testing.assert_array_equal(bbox, 0)
        else:
            np.testing.assert_allclose(
                bbox, [xs.min(), ys.min(), xs.max() - xs.min() + 1,
                       ys.max() - ys.min() + 1])


def test_iou_matches_dense(rng):
    masks = [random_mask(rng) for _ in range(4)]
    rles = [R.encode(m) for m in masks]
    got = R.iou(rles[:2], rles[2:])
    for i in range(2):
        for j in range(2):
            a, b = masks[i].astype(bool), masks[2 + j].astype(bool)
            inter = (a & b).sum()
            union = a.sum() + b.sum() - inter
            expect = inter / union if union else 0.0
            np.testing.assert_allclose(got[i, j], expect, rtol=1e-9)


def test_merge_union_and_intersect(rng):
    m1, m2 = random_mask(rng), random_mask(rng)
    r = R.merge([R.encode(m1), R.encode(m2)])
    np.testing.assert_array_equal(R.decode(r), (m1 | m2).astype(np.uint8))
    ri = R.merge([R.encode(m1), R.encode(m2)], intersect=True)
    np.testing.assert_array_equal(R.decode(ri), (m1 & m2).astype(np.uint8))


def test_string_codec_roundtrip(rng):
    counts = rng.integers(0, 5000, size=31).astype(np.uint32)
    s = R.counts_to_string(counts)
    back = R.string_to_counts(s)
    np.testing.assert_array_equal(back, counts)


def test_string_codec_known_value():
    # a tiny known case exercised both directions
    m = np.array([[1, 0], [1, 0]], np.uint8)  # col-major: 1,1,0,0
    rle = R.encode(m)
    counts = R.string_to_counts(rle["counts"])
    np.testing.assert_array_equal(counts, [0, 2, 2])


def test_numpy_fallback_agrees(rng, monkeypatch):
    m = random_mask(rng)
    rle_fast = R.encode(m)
    lib = R._lib
    try:
        monkeypatch.setattr(R, "_lib", None)
        monkeypatch.setattr(R, "_lib_tried", True)
        rle_slow = R.encode(m)
        assert rle_fast["counts"] == rle_slow["counts"]
        np.testing.assert_array_equal(R.decode(rle_slow), m)
        np.testing.assert_allclose(R.toBbox(rle_slow), R.toBbox(rle_fast))
    finally:
        monkeypatch.setattr(R, "_lib", lib)


def test_3d_stack_encode(rng):
    stack = np.stack([random_mask(rng) for _ in range(3)], axis=2)
    rles = R.encode(np.asfortranarray(stack))
    assert len(rles) == 3
    np.testing.assert_array_equal(R.decode(rles), stack)
