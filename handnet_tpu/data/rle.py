"""RLE binary-mask ops: the pycocotools.mask API surface on a C++ kernel.

Public API mirrors what the reference's data layer uses (lib/pycocotools/
mask.py facade; call sites datasets3d/a2jdataset.py:217-219,
e2edataset.py:176-198, detectdataset.py:56-60):

    encode(mask)  decode(rle)  toBbox(rle)  area(rle)  iou(rles, rles, flags)
    merge(rles, intersect=False)

RLE dicts are {'size': [h, w], 'counts': bytes} with the standard COCO
compressed-counts string codec. The heavy lifting (run scans) is the C++
kernel in native/rle/rle.cpp loaded via ctypes; a pure-numpy fallback keeps
the package importable without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Union

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "rle", "rle.cpp")
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "rle", "librle.so")

_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _build_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, _SRC],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.rle_encode.restype = ctypes.c_int
        lib.rle_area.restype = ctypes.c_uint64
        lib.rle_iou.restype = ctypes.c_double
        lib.rle_merge.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _u32(arr):
    return np.ascontiguousarray(arr, np.uint32)


# ---------------------------------------------------------------------------
# counts <-> COCO compressed string (LEB128-with-sign-and-delta codec).


def counts_to_string(counts: np.ndarray) -> bytes:
    """COCO RLE char codec: delta-encode every count after the 2nd, then
    6-bit varint with 0x30 bias (the published pycocotools format)."""
    out = bytearray()
    counts = [int(c) for c in counts]
    for i, c in enumerate(counts):
        x = c - (counts[i - 2] if i > 2 else 0)
        more = True
        while more:
            chunk = x & 0x1F
            x >>= 5
            # sign-propagating arithmetic shift emulation
            if x == 0 and not (chunk & 0x10):
                more = False
            elif x == -1 and (chunk & 0x10):
                more = False
            else:
                more = True
            if more:
                chunk |= 0x20
            out.append(chunk + 48)
    return bytes(out)


def string_to_counts(s: Union[bytes, str]) -> np.ndarray:
    if isinstance(s, str):
        s = s.encode()
    counts: List[int] = []
    i = 0
    while i < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = s[i] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * (k + 1))
            k += 1
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return np.asarray(counts, np.uint32)


# ---------------------------------------------------------------------------
# Core ops (C++ fast path, numpy fallback).


def _encode_counts(mask_colmajor_flat: np.ndarray, h: int, w: int) -> np.ndarray:
    lib = _build_lib()
    if lib is not None:
        counts = np.empty(h * w + 1, np.uint32)
        m = np.ascontiguousarray(mask_colmajor_flat, np.uint8)
        n = lib.rle_encode(m.ctypes.data_as(ctypes.c_char_p), h, w,
                           counts.ctypes.data_as(ctypes.c_char_p))
        return counts[:n].copy()
    # numpy fallback: run lengths via diff of change points
    m = mask_colmajor_flat.astype(bool)
    change = np.flatnonzero(m[1:] != m[:-1]) + 1
    bounds = np.concatenate([[0], change, [m.size]])
    runs = np.diff(bounds).astype(np.uint32)
    if m[0]:
        runs = np.concatenate([[np.uint32(0)], runs])
    return runs


def encode(mask: np.ndarray) -> Union[dict, List[dict]]:
    """Encode HxW (or HxWxN, fortran-order) uint8 masks to RLE dict(s)."""
    if mask.ndim == 2:
        h, w = mask.shape
        flat = np.asfortranarray(mask).ravel(order="F")
        counts = _encode_counts(flat, h, w)
        return {"size": [h, w], "counts": counts_to_string(counts)}
    assert mask.ndim == 3
    return [encode(mask[:, :, i]) for i in range(mask.shape[2])]


def _get_counts(rle: dict) -> np.ndarray:
    c = rle["counts"]
    if isinstance(c, (bytes, str)):
        return string_to_counts(c)
    return _u32(c)


def decode(rle: Union[dict, Sequence[dict]]) -> np.ndarray:
    if isinstance(rle, dict):
        h, w = rle["size"]
        counts = _get_counts(rle)
        lib = _build_lib()
        if lib is not None:
            out = np.empty(h * w, np.uint8)
            lib.rle_decode(_u32(counts).ctypes.data_as(ctypes.c_char_p),
                           len(counts), h, w,
                           out.ctypes.data_as(ctypes.c_char_p))
        else:
            vals = np.zeros(len(counts), np.uint8)
            vals[1::2] = 1
            out = np.repeat(vals, counts.astype(np.int64))
            out = np.resize(out, h * w).astype(np.uint8)
        return out.reshape((w, h)).T  # column-major -> HxW
    return np.stack([decode(r) for r in rle], axis=2)


def area(rle: Union[dict, Sequence[dict]]):
    if isinstance(rle, dict):
        counts = _get_counts(rle)
        lib = _build_lib()
        if lib is not None:
            return int(lib.rle_area(
                _u32(counts).ctypes.data_as(ctypes.c_char_p), len(counts)))
        return int(counts[1::2].sum())
    return np.asarray([area(r) for r in rle])


def toBbox(rle: Union[dict, Sequence[dict]]) -> np.ndarray:
    """Tight [x, y, w, h] box (reference call site a2jdataset.py:219)."""
    if isinstance(rle, dict):
        h, w = rle["size"]
        counts = _get_counts(rle)
        lib = _build_lib()
        if lib is not None:
            bbox = np.empty(4, np.float64)
            lib.rle_to_bbox(_u32(counts).ctypes.data_as(ctypes.c_char_p),
                            len(counts), h, w,
                            bbox.ctypes.data_as(ctypes.c_char_p))
            return bbox
        m = decode(rle)
        ys, xs = np.nonzero(m)
        if len(xs) == 0:
            return np.zeros(4)
        return np.asarray([xs.min(), ys.min(), xs.max() - xs.min() + 1,
                           ys.max() - ys.min() + 1], np.float64)
    return np.stack([toBbox(r) for r in rle])


def iou(dt: Sequence[dict], gt: Sequence[dict],
        iscrowd: Optional[Sequence[int]] = None) -> np.ndarray:
    """Pairwise IoU matrix [len(dt), len(gt)] (maskApi rleIou semantics)."""
    if iscrowd is None:
        iscrowd = [0] * len(gt)
    out = np.zeros((len(dt), len(gt)))
    lib = _build_lib()
    for i, d in enumerate(dt):
        cd = _u32(_get_counts(d))
        for j, g in enumerate(gt):
            cg = _u32(_get_counts(g))
            if lib is not None:
                out[i, j] = lib.rle_iou(
                    cd.ctypes.data_as(ctypes.c_char_p), len(cd),
                    cg.ctypes.data_as(ctypes.c_char_p), len(cg),
                    int(iscrowd[j]))
            else:
                md, mg = decode(d).astype(bool), decode(g).astype(bool)
                inter = np.logical_and(md, mg).sum()
                denom = md.sum() if iscrowd[j] else (md.sum() + mg.sum()
                                                     - inter)
                out[i, j] = inter / denom if denom > 0 else 0.0
    return out


def merge(rles: Sequence[dict], intersect: bool = False) -> dict:
    """Union (or intersection) of several RLEs (maskApi rleMerge)."""
    assert len(rles) > 0
    h, w = rles[0]["size"]
    acc = _get_counts(rles[0])
    lib = _build_lib()
    for r in rles[1:]:
        cb = _get_counts(r)
        if lib is not None:
            out = np.empty(len(acc) + len(cb) + 2, np.uint32)
            n = lib.rle_merge(
                _u32(acc).ctypes.data_as(ctypes.c_char_p), len(acc),
                _u32(cb).ctypes.data_as(ctypes.c_char_p), len(cb),
                int(intersect), out.ctypes.data_as(ctypes.c_char_p))
            acc = out[:n].copy()
        else:
            ma = decode({"size": [h, w], "counts": acc}).astype(bool)
            mb = decode(r).astype(bool)
            m = (ma & mb) if intersect else (ma | mb)
            acc = _encode_counts(np.asfortranarray(m).ravel(order="F"), h, w)
    return {"size": [h, w], "counts": counts_to_string(acc)}
