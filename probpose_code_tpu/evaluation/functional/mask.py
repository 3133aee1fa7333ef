"""RLE mask utilities backed by the native C++ extension.

Replaces the xtcocotools C extension (reference
``mmpose/evaluation/metrics/_mask.py``): COCO column-major RLE
encode / decode / area / merge / IoU (crowd semantics) / bbox, and polygon
rasterization. The shared library is compiled on first use with g++ (no
packaging step); a pure-NumPy fallback covers environments without a
compiler.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
from typing import List, Optional, Union

import numpy as np

_CSRC = osp.join(osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))), "csrc")
_LIB_PATH = osp.join(_CSRC, "librle_mask.so")
_lib: Optional[ctypes.CDLL] = None


def _build_lib() -> Optional[str]:
    src = osp.join(_CSRC, "rle_mask.cpp")
    if not osp.isfile(src):
        return None
    # temp file + atomic rename: concurrent first-touch processes must never
    # dlopen a half-written .so
    tmp = f"{_LIB_PATH}.{os.getpid()}.tmp"
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", src, "-o", tmp],
            check=True,
            capture_output=True,
        )
        os.replace(tmp, _LIB_PATH)
        return _LIB_PATH
    except (subprocess.CalledProcessError, FileNotFoundError, OSError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not osp.isfile(_LIB_PATH) or osp.getmtime(_LIB_PATH) < osp.getmtime(osp.join(_CSRC, "rle_mask.cpp")):
        if _build_lib() is None:
            return None
    lib = ctypes.CDLL(_LIB_PATH)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f64p = ctypes.POINTER(ctypes.c_double)
    i64 = ctypes.c_int64

    lib.rle_encode.restype = i64
    lib.rle_encode.argtypes = [u8p, i64, i64, u32p]
    lib.rle_decode.restype = None
    lib.rle_decode.argtypes = [u32p, i64, i64, i64, u8p]
    lib.rle_area.restype = i64
    lib.rle_area.argtypes = [u32p, i64]
    lib.rle_iou.restype = ctypes.c_double
    lib.rle_iou.argtypes = [u32p, i64, u32p, i64, ctypes.c_int]
    lib.rle_merge.restype = i64
    lib.rle_merge.argtypes = [u32p, i64, u32p, i64, ctypes.c_int, u32p]
    lib.poly_to_mask.restype = None
    lib.poly_to_mask.argtypes = [f64p, i64, i64, i64, u8p]
    lib.rle_to_bbox.restype = None
    lib.rle_to_bbox.argtypes = [u32p, i64, i64, i64, f64p]
    _lib = lib
    return _lib


def _as_u32(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x, dtype=np.uint32))


def encode(mask: np.ndarray) -> dict:
    """Binary mask (h, w) -> RLE dict {'size': [h, w], 'counts': ndarray}."""
    h, w = mask.shape
    flat = np.ascontiguousarray(mask.T.reshape(-1).astype(np.uint8))  # column-major
    lib = _get_lib()
    if lib is not None:
        counts = np.empty(h * w + 1, dtype=np.uint32)
        n = lib.rle_encode(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        )
        return {"size": [h, w], "counts": counts[:n].copy()}
    # numpy fallback
    diffs = np.nonzero(np.diff(flat))[0] + 1
    boundaries = np.concatenate([[0], diffs, [h * w]])
    counts = np.diff(boundaries).astype(np.uint32)
    if flat[0] == 1:
        counts = np.concatenate([[np.uint32(0)], counts])
    return {"size": [h, w], "counts": counts}


def decode(rle: dict) -> np.ndarray:
    h, w = rle["size"]
    counts = _as_u32(rle["counts"])
    lib = _get_lib()
    if lib is not None:
        mask = np.empty(h * w, dtype=np.uint8)
        lib.rle_decode(
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(counts), h, w,
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return mask.reshape(w, h).T
    flat = np.zeros(h * w, dtype=np.uint8)
    pos, v = 0, 0
    for c in counts:
        flat[pos:pos + int(c)] = v
        pos += int(c)
        v = 1 - v
    return flat.reshape(w, h).T


def area(rle: dict) -> int:
    counts = _as_u32(rle["counts"])
    lib = _get_lib()
    if lib is not None:
        return int(lib.rle_area(counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(counts)))
    return int(counts[1::2].sum())


def iou(dts: List[dict], gts: List[dict], iscrowd: List[int]) -> np.ndarray:
    """Pairwise IoU matrix (len(dts), len(gts)); crowd gt -> IoA."""
    out = np.zeros((len(dts), len(gts)), dtype=np.float64)
    lib = _get_lib()
    for j, g in enumerate(gts):
        gc = _as_u32(g["counts"])
        crowd = int(iscrowd[j]) if j < len(iscrowd) else 0
        for i, d in enumerate(dts):
            dc = _as_u32(d["counts"])
            if lib is not None:
                out[i, j] = lib.rle_iou(
                    dc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(dc),
                    gc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(gc), crowd,
                )
            else:
                md, mg = decode(d).astype(bool), decode(g).astype(bool)
                inter = (md & mg).sum()
                denom = md.sum() if crowd else (md.sum() + mg.sum() - inter)
                out[i, j] = inter / denom if denom else 0.0
    return out


def merge(rles: List[dict], intersect: bool = False) -> dict:
    assert rles, "empty RLE list"
    h, w = rles[0]["size"]
    acc = _as_u32(rles[0]["counts"])
    lib = _get_lib()
    for other in rles[1:]:
        oc = _as_u32(other["counts"])
        if lib is not None:
            buf = np.empty(h * w + 2, dtype=np.uint32)
            n = lib.rle_merge(
                acc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(acc),
                oc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(oc),
                int(intersect),
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            )
            acc = buf[:n].copy()
        else:
            a, b = decode({"size": [h, w], "counts": acc}), decode(other)
            m = (a.astype(bool) & b.astype(bool)) if intersect else (a.astype(bool) | b.astype(bool))
            acc = _as_u32(encode(m.astype(np.uint8))["counts"])
    return {"size": [h, w], "counts": acc}


def frPoly(polys: List, h: int, w: int) -> List[dict]:
    """Rasterize polygons ([x0, y0, x1, y1, ...] lists) to RLEs."""
    lib = _get_lib()
    out = []
    for poly in polys:
        xy = np.ascontiguousarray(np.asarray(poly, dtype=np.float64).reshape(-1))
        n_pts = len(xy) // 2
        if lib is not None:
            mask = np.empty(h * w, dtype=np.uint8)
            lib.poly_to_mask(
                xy.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n_pts, h, w,
                mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            )
            out.append(encode(mask.reshape(w, h).T))
        else:
            import cv2

            mask = np.zeros((h, w), dtype=np.uint8)
            pts = xy.reshape(-1, 2).astype(np.int32)
            cv2.fillPoly(mask, [pts], 1)
            out.append(encode(mask))
    return out


def toBbox(rle: dict) -> np.ndarray:
    h, w = rle["size"]
    counts = _as_u32(rle["counts"])
    lib = _get_lib()
    if lib is not None:
        bbox = np.empty(4, dtype=np.float64)
        lib.rle_to_bbox(
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(counts), h, w,
            bbox.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return bbox
    mask = decode(rle)
    ys, xs = np.nonzero(mask)
    if len(xs) == 0:
        return np.zeros(4)
    return np.array([xs.min(), ys.min(), xs.max() - xs.min() + 1, ys.max() - ys.min() + 1], dtype=np.float64)
