"""ctypes bindings for the native fused JPEG-decode + affine-warp kernel.

``csrc/image_pipeline.cpp`` fuses the two hottest host stages of the
top-down input pipeline (reference ``mmcv.imread`` +
``cv2.warpAffine``, ``mmpose/datasets/transforms/topdown_transforms.py:126``)
into one C++ call that decodes ONLY the JPEG region the warp samples
(libjpeg-turbo ``jpeg_crop_scanline``/``jpeg_skip_scanlines``) and warps it
straight into the model input crop. ctypes releases the GIL during the call,
so DataLoader worker threads scale on multi-core hosts.

The library is compiled on first use with g++ (same pattern as
``evaluation/functional/mask.py``); every entry point returns ``None`` when
the native path is unavailable so callers can fall back to cv2.
"""

from __future__ import annotations

import ctypes
import os.path as osp
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_CSRC = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "csrc")
_SRC = osp.join(_CSRC, "image_pipeline.cpp")
_LIB_PATH = osp.join(_CSRC, "libimage_pipeline.so")
_lib = None
_lib_failed = False
_build_lock = threading.Lock()


def _build_lib() -> Optional[str]:
    if not osp.isfile(_SRC):
        return None
    # compile to a per-process temp file and os.rename (atomic on POSIX):
    # concurrent first-touch workers must never dlopen a half-written .so
    import os

    tmp = f"{_LIB_PATH}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", _SRC, "-o", tmp,
        "-I/usr/include/opencv4",
        "-ljpeg", "-lopencv_core", "-lopencv_imgproc",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, _LIB_PATH)
        return _LIB_PATH
    except (subprocess.CalledProcessError, FileNotFoundError, OSError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def _get_lib():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _build_lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not osp.isfile(_LIB_PATH) or (
            osp.isfile(_SRC) and osp.getmtime(_LIB_PATH) < osp.getmtime(_SRC)
        ):
            if _build_lib() is None:
                _lib_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _lib_failed = True
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f64p = ctypes.POINTER(ctypes.c_double)
        i32p = ctypes.POINTER(ctypes.c_int)
        lib.ppt_probe.restype = ctypes.c_int
        lib.ppt_probe.argtypes = [u8p, ctypes.c_int64, i32p, i32p, i32p]
        lib.ppt_decode_region.restype = ctypes.c_int
        lib.ppt_decode_region.argtypes = [
            u8p, ctypes.c_int64, f64p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, u8p, ctypes.c_int, ctypes.c_int,
        ]
        _lib = lib
    return _lib


def available() -> bool:
    return _get_lib() is not None


def _as_u8p(buf: bytes):
    return ctypes.cast(ctypes.c_char_p(buf), ctypes.POINTER(ctypes.c_uint8))


def probe(jpeg_bytes: bytes) -> Optional[Tuple[int, int, int]]:
    """(width, height, exif_orientation) from the header, or None if the
    buffer is not a decodable JPEG / the native lib is unavailable.
    orientation is 0 when no EXIF tag is present (treat as 1 = upright)."""
    lib = _get_lib()
    if lib is None:
        return None
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    o = ctypes.c_int(0)
    rc = lib.ppt_probe(
        _as_u8p(jpeg_bytes), len(jpeg_bytes),
        ctypes.byref(w), ctypes.byref(h), ctypes.byref(o),
    )
    if rc != 0:
        return None
    return w.value, h.value, o.value


def _pick_denom(warp_mat: np.ndarray, fast_scale: bool) -> int:
    """DCT-domain downscale factor: decode at 1/denom when every output pixel
    steps >= denom source pixels (min singular value of the inverse map)."""
    if not fast_scale:
        return 1
    m = np.asarray(warp_mat, np.float64).reshape(6)
    det = m[0] * m[4] - m[1] * m[3]
    if abs(det) < 1e-12:
        return 1
    # closed-form smaller singular value of the 2x2 inverse
    a, b, c, d = m[4] / det, -m[1] / det, -m[3] / det, m[0] / det
    t1 = a * a + b * b + c * c + d * d
    t2 = ((a * a + b * b - c * c - d * d) ** 2 + 4.0 * (a * c + b * d) ** 2) ** 0.5
    smin = max(0.0, (t1 - t2) / 2.0) ** 0.5
    denom = 1
    while denom < 8 and smin >= 2.0 * denom:
        denom *= 2
    return denom


def decode_warp(
    jpeg_bytes: bytes,
    warp_mat: np.ndarray,
    out_size: Tuple[int, int],
    flip_h: bool = False,
    fast_scale: bool = False,
    mask_rect: Optional[np.ndarray] = None,
    img_size: Optional[Tuple[int, int]] = None,
):
    """Sparse region decode + warp into a (h, w, 3) uint8 BGR crop.

    The native kernel decodes only the JPEG region the warp samples into a
    zeroed full-size buffer (applying ``flip_h`` — identical to ``np.flip``);
    the warp then runs through the SAME Python cv2 build as the eager path,
    making the crop bit-exact with full decode + warp (``fast_scale=False``).
    ``warp_mat`` is the 2x3 affine from POST-FLIP source pixel coords to crop
    coords. ``mask_rect`` (x0, y0, x1, y1, post-flip coords) additionally
    rasterizes + warps the bbox coverage mask. Returns ``crop`` or
    ``(crop, mask)``; ``None`` when the native path is unavailable or the
    stream fails to decode (caller falls back to cv2).
    """
    lib = _get_lib()
    if lib is None:
        return None
    import cv2

    if img_size is not None:  # caller already probed (LoadImage lazy path)
        img_w, img_h = int(img_size[0]), int(img_size[1])
    else:
        info = probe(jpeg_bytes)
        if info is None:
            return None
        img_w, img_h, _ = info
    w, h = int(out_size[0]), int(out_size[1])
    M = np.ascontiguousarray(np.asarray(warp_mat, dtype=np.float64).reshape(6))
    denom = _pick_denom(M, fast_scale)
    ws = -(-img_w // denom)  # ceil, matches jpeg_calc_output_dimensions
    hs = -(-img_h // denom)
    buf = np.zeros((hs, ws, 3), np.uint8)
    rc = lib.ppt_decode_region(
        _as_u8p(jpeg_bytes), len(jpeg_bytes),
        M.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        int(flip_h), w, h, denom,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), hs, ws,
    )
    if rc != 0:
        return None
    if denom == 1:
        T = M.reshape(2, 3)
    else:
        # scaled -> original alignment: x_orig = denom * x_scaled + (denom-1)/2
        half = (denom - 1) * 0.5
        Mm = M.reshape(2, 3)
        T = np.concatenate(
            [Mm[:, :2] * denom, (Mm[:, :2].sum(axis=1) * half + Mm[:, 2])[:, None]], axis=1
        )
    crop = cv2.warpAffine(buf, T, (w, h), flags=cv2.INTER_LINEAR)
    if mask_rect is None:
        return crop
    # bbox coverage mask with the Python path's integer semantics
    # (clip then int() truncate) on the scaled grid
    rect = np.asarray(mask_rect, np.float64).reshape(4).copy()
    rect[:2] = np.maximum(rect[:2], 0)
    rect[2:4] = np.minimum(rect[2:4], [img_w, img_h])
    x0, y0, x1, y1 = rect.astype(int)
    if denom > 1:
        half = (denom - 1) * 0.5
        x0, x1 = (int(np.ceil((v - half) / denom - 1e-9)) for v in (x0, x1))
        y0, y1 = (int(np.ceil((v - half) / denom - 1e-9)) for v in (y0, y1))
    mask_full = np.zeros((hs, ws), np.uint8)
    # plain numpy slicing, including its negative-index wraparound, to stay
    # bit-identical with the eager TopdownAffine mask path
    mask_full[y0:y1, x0:x1] = 1
    mask = cv2.warpAffine(mask_full, T, (w, h), flags=cv2.INTER_LINEAR)
    return crop, mask
