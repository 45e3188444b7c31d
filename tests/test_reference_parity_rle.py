"""Parity vs the reference's OWN RLE C kernel (lib/pycocotools/maskApi.c).

pycocotools is not installed and the reference's _mask.pyx needs Cython, but
maskApi.c — the actual run-length kernel everything delegates to — is plain
C. Compile it straight from the read-only mount at test time (never copied)
and drive it through ctypes, asserting data/rle.py (and its C++ kernel
native/rle/rle.cpp) produces byte-identical RLE strings, counts, areas,
bboxes, IoU matrices and merges.

Reference call sites for these semantics: lib/pycocotools/mask.py facade,
datasets3d/a2jdataset.py:217-219, e2edataset.py:176-198.

Skips when /root/reference or a C compiler is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from ctypes import POINTER, byref, c_char_p, c_double, c_ubyte, c_uint, c_ulong

import numpy as np
import pytest

REF = os.environ.get("HANDNET_REFERENCE", "/root/reference")
MASKAPI_C = os.path.join(REF, "lib", "pycocotools", "maskApi.c")

pytestmark = pytest.mark.skipif(
    not os.path.isfile(MASKAPI_C), reason="reference mount not available")


class _RLE(ctypes.Structure):
    # typedef struct { siz h, w, m; uint *cnts; } RLE;  (maskApi.h)
    _fields_ = [("h", c_ulong), ("w", c_ulong), ("m", c_ulong),
                ("cnts", POINTER(c_uint))]


@pytest.fixture(scope="module")
def ref_maskapi(tmp_path_factory):
    """Compile the reference maskApi.c to a shared lib and bind it."""
    so = tmp_path_factory.mktemp("maskapi") / "libmaskapi.so"
    try:
        subprocess.run(["gcc", "-O2", "-shared", "-fPIC", "-o", str(so),
                        MASKAPI_C], check=True, capture_output=True)
    except (OSError, subprocess.CalledProcessError) as e:
        pytest.skip(f"cannot compile reference maskApi.c: {e}")
    lib = ctypes.CDLL(str(so))
    lib.rleEncode.argtypes = [POINTER(_RLE), POINTER(c_ubyte), c_ulong,
                              c_ulong, c_ulong]
    lib.rleDecode.argtypes = [POINTER(_RLE), POINTER(c_ubyte), c_ulong]
    lib.rleMerge.argtypes = [POINTER(_RLE), POINTER(_RLE), c_ulong,
                             ctypes.c_bool]
    lib.rleArea.argtypes = [POINTER(_RLE), c_ulong, POINTER(c_uint)]
    lib.rleIou.argtypes = [POINTER(_RLE), POINTER(_RLE), c_ulong, c_ulong,
                           POINTER(c_ubyte), POINTER(c_double)]
    lib.rleToBbox.argtypes = [POINTER(_RLE), POINTER(c_double), c_ulong]
    lib.rleToString.restype = ctypes.c_void_p  # manual cast; C mallocs
    lib.rleToString.argtypes = [POINTER(_RLE)]
    lib.rleFrString.argtypes = [POINTER(_RLE), c_char_p, c_ulong, c_ulong]
    return lib


def _ref_encode(lib, mask: np.ndarray) -> _RLE:
    h, w = mask.shape
    flat = np.asfortranarray(mask).ravel(order="F").astype(np.uint8)
    r = _RLE()
    lib.rleEncode(byref(r), flat.ctypes.data_as(POINTER(c_ubyte)), h, w, 1)
    return r


def _counts(r: _RLE) -> np.ndarray:
    if r.m == 0:
        return np.zeros(0, np.uint32)
    return np.ctypeslib.as_array(r.cnts, shape=(r.m,)).copy()


def _masks(rng) -> list:
    """Assorted masks: blobby, sparse, empty, full, single-pixel corners."""
    out = []
    for p in (0.5, 0.05, 0.95):
        out.append((rng.random((37, 23)) < p).astype(np.uint8))
    m = np.zeros((40, 50), np.uint8)
    m[5:25, 10:30] = 1
    m[30:38, 2:12] = 1
    out.append(m)
    out.append(np.zeros((16, 16), np.uint8))
    out.append(np.ones((16, 16), np.uint8))
    c = np.zeros((8, 9), np.uint8)
    c[0, 0] = 1
    c[-1, -1] = 1
    out.append(c)
    return out


def test_encode_and_string_match_reference(ref_maskapi):
    from handnet_tpu.data import rle as my

    rng = np.random.default_rng(10)
    for mask in _masks(rng):
        r = _ref_encode(ref_maskapi, mask)
        sptr = ref_maskapi.rleToString(byref(r))
        ref_str = ctypes.cast(sptr, c_char_p).value
        mine = my.encode(mask)
        assert mine["counts"] == ref_str, mask.shape
        assert mine["size"] == list(mask.shape)
        # counts themselves too (codec-independent)
        np.testing.assert_array_equal(
            my.string_to_counts(mine["counts"]), _counts(r))


def test_decode_matches_reference(ref_maskapi):
    from handnet_tpu.data import rle as my

    rng = np.random.default_rng(11)
    for mask in _masks(rng):
        h, w = mask.shape
        mine = my.encode(mask)
        # decode OUR string with THEIR decoder
        r = _RLE()
        ref_maskapi.rleFrString(byref(r), c_char_p(mine["counts"]), h, w)
        buf = np.zeros(h * w, np.uint8)
        ref_maskapi.rleDecode(byref(r), buf.ctypes.data_as(POINTER(c_ubyte)),
                              1)
        np.testing.assert_array_equal(
            buf.reshape((w, h)).T, mask, err_msg="ref decode of our string")
        # and OUR decoder round-trips
        np.testing.assert_array_equal(my.decode(mine), mask)


def test_area_and_bbox_match_reference(ref_maskapi):
    from handnet_tpu.data import rle as my

    rng = np.random.default_rng(12)
    for mask in _masks(rng):
        r = _ref_encode(ref_maskapi, mask)
        a = c_uint(0)
        ref_maskapi.rleArea(byref(r), 1, byref(a))
        bb = np.zeros(4, np.float64)
        ref_maskapi.rleToBbox(byref(r), bb.ctypes.data_as(POINTER(c_double)),
                              1)
        mine = my.encode(mask)
        assert my.area(mine) == a.value
        np.testing.assert_array_equal(my.toBbox(mine), bb)


def test_iou_matches_reference(ref_maskapi):
    from handnet_tpu.data import rle as my

    rng = np.random.default_rng(13)
    masks = [(rng.random((31, 17)) < p).astype(np.uint8)
             for p in (0.3, 0.5, 0.7, 0.0)]
    dt, gt = masks[:2], masks[2:]
    rd = (_RLE * 2)(*[_ref_encode(ref_maskapi, m) for m in dt])
    rg = (_RLE * 2)(*[_ref_encode(ref_maskapi, m) for m in gt])
    for crowd in ([0, 0], [1, 0]):
        iscrowd = (c_ubyte * 2)(*crowd)
        out = np.zeros(4, np.float64)
        ref_maskapi.rleIou(rd, rg, 2, 2,
                           iscrowd, out.ctypes.data_as(POINTER(c_double)))
        ref_mat = out.reshape((2, 2), order="F")  # maskApi fills o[g*m+d]
        mine = my.iou([my.encode(m) for m in dt],
                      [my.encode(m) for m in gt], crowd)
        np.testing.assert_allclose(mine, ref_mat, atol=1e-12)


def test_merge_matches_reference(ref_maskapi):
    from handnet_tpu.data import rle as my

    rng = np.random.default_rng(14)
    a = (rng.random((29, 21)) < 0.4).astype(np.uint8)
    b = (rng.random((29, 21)) < 0.4).astype(np.uint8)
    rs = (_RLE * 2)(_ref_encode(ref_maskapi, a), _ref_encode(ref_maskapi, b))
    for intersect in (False, True):
        m = _RLE()
        ref_maskapi.rleMerge(rs, byref(m), 2, intersect)
        sptr = ref_maskapi.rleToString(byref(m))
        ref_str = ctypes.cast(sptr, c_char_p).value
        mine = my.merge([my.encode(a), my.encode(b)], intersect=intersect)
        assert mine["counts"] == ref_str
