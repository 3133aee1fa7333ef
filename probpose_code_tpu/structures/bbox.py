"""Bounding-box geometry: format conversion, flips, and affine warp matrices.

Behavioral parity with the reference ``mmpose/structures/bbox/transforms.py``
(bbox_xyxy2cs:44, get_udp_warp_matrix:315, get_warp_matrix:362). The 3-point
affine solve replaces ``cv2.getAffineTransform`` with a direct linear solve —
same exact system, no OpenCV dependency on the critical path.

All functions are pure NumPy and vectorized over leading batch dims where the
reference accepted single boxes only; device-side (jnp) warp application lives
in ``probpose_code_tpu.ops.warp``.
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np


def bbox_xyxy2xywh(bbox_xyxy: np.ndarray) -> np.ndarray:
    out = bbox_xyxy.copy()
    out[..., 2] = out[..., 2] - out[..., 0]
    out[..., 3] = out[..., 3] - out[..., 1]
    return out


def bbox_xywh2xyxy(bbox_xywh: np.ndarray) -> np.ndarray:
    out = bbox_xywh.copy()
    out[..., 2] = out[..., 2] + out[..., 0]
    out[..., 3] = out[..., 3] + out[..., 1]
    return out


def bbox_xyxy2cs(bbox: np.ndarray, padding: float = 1.0) -> Tuple[np.ndarray, np.ndarray]:
    """xyxy -> (center, scale). ``scale`` is (w, h) * padding."""
    dim = bbox.ndim
    if dim == 1:
        bbox = bbox[None, :]
    scale = (bbox[..., 2:4] - bbox[..., :2]) * padding
    center = (bbox[..., 2:4] + bbox[..., :2]) * 0.5
    if dim == 1:
        center, scale = center[0], scale[0]
    return center, scale


def bbox_xywh2cs(bbox: np.ndarray, padding: float = 1.0) -> Tuple[np.ndarray, np.ndarray]:
    dim = bbox.ndim
    if dim == 1:
        bbox = bbox[None, :]
    center = bbox[..., :2] + bbox[..., 2:4] * 0.5
    scale = bbox[..., 2:4] * padding
    if dim == 1:
        center, scale = center[0], scale[0]
    return center, scale


def bbox_cs2xyxy(center: np.ndarray, scale: np.ndarray, padding: float = 1.0) -> np.ndarray:
    dim = center.ndim
    if dim == 1:
        center, scale = center[None, :], scale[None, :]
    wh = scale / padding
    xy = center - 0.5 * wh
    bbox = np.concatenate((xy, xy + wh), axis=-1)
    if dim == 1:
        bbox = bbox[0]
    return bbox


def bbox_cs2xywh(center: np.ndarray, scale: np.ndarray, padding: float = 1.0) -> np.ndarray:
    dim = center.ndim
    if dim == 1:
        center, scale = center[None, :], scale[None, :]
    wh = scale / padding
    xy = center - 0.5 * wh
    bbox = np.concatenate((xy, wh), axis=-1)
    if dim == 1:
        bbox = bbox[0]
    return bbox


def bbox_clip_border(bbox: np.ndarray, shape: Tuple[int, int]) -> np.ndarray:
    """Clip bbox coords (xyxy or points) to (w, h)."""
    width, height = shape[:2]
    if bbox.shape[-1] == 2:
        bbox[..., 0] = np.clip(bbox[..., 0], 0, width)
        bbox[..., 1] = np.clip(bbox[..., 1], 0, height)
    else:
        bbox[..., ::2] = np.clip(bbox[..., ::2], 0, width)
        bbox[..., 1::2] = np.clip(bbox[..., 1::2], 0, height)
    return bbox


def flip_bbox(
    bbox: np.ndarray,
    image_size: Tuple[int, int],
    bbox_format: str = "xywh",
    direction: str = "horizontal",
) -> np.ndarray:
    assert direction in {"horizontal", "vertical", "diagonal"}
    assert bbox_format in {"xywh", "xyxy", "center"}
    out = bbox.copy()
    w, h = image_size
    if direction == "horizontal":
        if bbox_format in ("xywh", "center"):
            out[..., 0] = w - bbox[..., 0] - 1
        else:
            out[..., ::2] = w - bbox[..., -2::-2] - 1
    elif direction == "vertical":
        if bbox_format in ("xywh", "center"):
            out[..., 1] = h - bbox[..., 1] - 1
        else:
            out[..., 1::2] = h - bbox[..., ::-2] - 1
    else:  # diagonal
        if bbox_format in ("xywh", "center"):
            out[..., :2] = np.asarray([w, h]) - bbox[..., :2] - 1
        else:
            out = np.asarray([w, h, w, h]) - bbox - 1
            out = np.concatenate((out[..., 2:], out[..., :2]), axis=-1)
    return out


def get_udp_warp_matrix(
    center: np.ndarray,
    scale: np.ndarray,
    rot: float,
    output_size: Tuple[int, int],
) -> np.ndarray:
    """UDP-unbiased affine matrix mapping bbox area to output pixel grid.

    Matches reference ``bbox/transforms.py:315-360``: pixel-grid-aligned
    scaling ``(out-1)/scale`` with rotation about the bbox center.
    """
    center = np.asarray(center, dtype=np.float64)
    scale = np.asarray(scale, dtype=np.float64)
    input_size = center * 2
    rot_rad = np.deg2rad(rot)
    warp_mat = np.zeros((2, 3), dtype=np.float32)
    scale_x = (output_size[0] - 1) / scale[0]
    scale_y = (output_size[1] - 1) / scale[1]
    cos_r, sin_r = math.cos(rot_rad), math.sin(rot_rad)
    warp_mat[0, 0] = cos_r * scale_x
    warp_mat[0, 1] = -sin_r * scale_x
    warp_mat[0, 2] = scale_x * (-0.5 * input_size[0] * cos_r + 0.5 * input_size[1] * sin_r + 0.5 * scale[0])
    warp_mat[1, 0] = sin_r * scale_y
    warp_mat[1, 1] = cos_r * scale_y
    warp_mat[1, 2] = scale_y * (-0.5 * input_size[0] * sin_r - 0.5 * input_size[1] * cos_r + 0.5 * scale[1])
    return warp_mat


def udp_warp_matrices(centers: np.ndarray, scales: np.ndarray, rots: np.ndarray, output_size) -> np.ndarray:
    """Vectorized UDP warp matrices for N boxes -> (N, 2, 3) float32."""
    centers = np.atleast_2d(np.asarray(centers, dtype=np.float64))
    scales = np.atleast_2d(np.asarray(scales, dtype=np.float64))
    rots = np.atleast_1d(np.asarray(rots, dtype=np.float64))
    n = centers.shape[0]
    input_size = centers * 2
    rot_rad = np.deg2rad(rots)
    cos_r, sin_r = np.cos(rot_rad), np.sin(rot_rad)
    scale_x = (output_size[0] - 1) / scales[:, 0]
    scale_y = (output_size[1] - 1) / scales[:, 1]
    mats = np.zeros((n, 2, 3), dtype=np.float32)
    mats[:, 0, 0] = cos_r * scale_x
    mats[:, 0, 1] = -sin_r * scale_x
    mats[:, 0, 2] = scale_x * (-0.5 * input_size[:, 0] * cos_r + 0.5 * input_size[:, 1] * sin_r + 0.5 * scales[:, 0])
    mats[:, 1, 0] = sin_r * scale_y
    mats[:, 1, 1] = cos_r * scale_y
    mats[:, 1, 2] = scale_y * (-0.5 * input_size[:, 0] * sin_r - 0.5 * input_size[:, 1] * cos_r + 0.5 * scales[:, 1])
    return mats


def _rotate_point(pt: np.ndarray, angle_rad: float) -> np.ndarray:
    sn, cs = np.sin(angle_rad), np.cos(angle_rad)
    rot_mat = np.array([[cs, -sn], [sn, cs]])
    return rot_mat @ pt


def _get_3rd_point(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    direction = a - b
    return b + np.r_[-direction[1], direction[0]]


def _solve_affine(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Exact 3-point affine solve (same system as cv2.getAffineTransform)."""
    a = np.zeros((6, 6), dtype=np.float64)
    b = np.zeros(6, dtype=np.float64)
    for i in range(3):
        a[2 * i, 0:2] = src[i]
        a[2 * i, 2] = 1.0
        a[2 * i + 1, 3:5] = src[i]
        a[2 * i + 1, 5] = 1.0
        b[2 * i] = dst[i, 0]
        b[2 * i + 1] = dst[i, 1]
    x = np.linalg.solve(a, b)
    return x.reshape(2, 3)


def get_warp_matrix(
    center: np.ndarray,
    scale: np.ndarray,
    rot: float,
    output_size: Tuple[int, int],
    shift: Tuple[float, float] = (0.0, 0.0),
    inv: bool = False,
    fix_aspect_ratio: bool = True,
) -> np.ndarray:
    """Standard 3-point affine warp matrix (reference bbox/transforms.py:362)."""
    center = np.asarray(center, dtype=np.float64)
    scale = np.asarray(scale, dtype=np.float64)
    shift = np.asarray(shift, dtype=np.float64)
    src_w, src_h = scale[:2]
    dst_w, dst_h = output_size[:2]

    rot_rad = np.deg2rad(rot)
    src_dir = _rotate_point(np.array([src_w * -0.5, 0.0]), rot_rad)
    dst_dir = np.array([dst_w * -0.5, 0.0])

    src = np.zeros((3, 2), dtype=np.float64)
    src[0, :] = center + scale * shift
    src[1, :] = center + src_dir + scale * shift
    dst = np.zeros((3, 2), dtype=np.float64)
    dst[0, :] = [dst_w * 0.5, dst_h * 0.5]
    dst[1, :] = np.array([dst_w * 0.5, dst_h * 0.5]) + dst_dir

    if fix_aspect_ratio:
        src[2, :] = _get_3rd_point(src[0, :], src[1, :])
        dst[2, :] = _get_3rd_point(dst[0, :], dst[1, :])
    else:
        src_dir_2 = _rotate_point(np.array([0.0, src_h * -0.5]), rot_rad)
        dst_dir_2 = np.array([0.0, dst_h * -0.5])
        src[2, :] = center + src_dir_2 + scale * shift
        dst[2, :] = np.array([dst_w * 0.5, dst_h * 0.5]) + dst_dir_2

    if inv:
        return _solve_affine(dst, src)
    return _solve_affine(src, dst)


def get_pers_warp_matrix(
    center: np.ndarray, translate: np.ndarray, scale: float, rot: float, shear: np.ndarray
) -> np.ndarray:
    """Perspective warp composed of translate/shear/rotate/scale about center."""
    translate_mat = np.array(
        [[1, 0, translate[0] + center[0]], [0, 1, translate[1] + center[1]], [0, 0, 1]], dtype=np.float32
    )
    shear_x, shear_y = math.radians(shear[0]), math.radians(shear[1])
    shear_mat = np.array([[1, np.tan(shear_x), 0], [np.tan(shear_y), 1, 0], [0, 0, 1]], dtype=np.float32)
    ang = math.radians(rot)
    rotate_mat = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], dtype=np.float32
    )
    scale_mat = np.array([[scale, 0, 0], [0, scale, 0], [0, 0, 1]], dtype=np.float32)
    recover_center_mat = np.array([[1, 0, -center[0]], [0, 1, -center[1]], [0, 0, 1]], dtype=np.float32)
    return translate_mat @ shear_mat @ rotate_mat @ scale_mat @ recover_center_mat
