"""Keypoint geometry: flips, border clipping, min-padding / aspect utilities.

Parity targets in the reference:
- ``mmpose/structures/keypoint/transforms.py:7`` (flip_keypoints)
- ``mmpose/structures/keypoint/keypoints_min_padding.py:4,68``
  (find_min_padding_exact / fix_bbox_aspect_ratio — the ProbPose extended-bbox
  machinery used by the dataset parser, the Ex-OKS evaluator, and the head).

All pure NumPy; the min-padding pair is vectorized over instances (the
reference loops per-box in fix_bbox_aspect_ratio).
"""

from __future__ import annotations

from typing import List, Optional, Tuple, Union

import numpy as np


def flip_keypoints(
    keypoints: np.ndarray,
    keypoints_visible: Optional[np.ndarray],
    image_size: Tuple[int, int],
    flip_indices: List[int],
    direction: str = "horizontal",
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Flip keypoints (and visibility) in the given direction with symmetric
    keypoint swapping."""
    ndim = keypoints.ndim
    assert direction in {"horizontal", "vertical", "diagonal"}

    if direction in ("horizontal", "vertical"):
        keypoints = keypoints.take(flip_indices, axis=ndim - 2)
        if keypoints_visible is not None:
            keypoints_visible = keypoints_visible.take(flip_indices, axis=ndim - 2)
    else:
        keypoints = keypoints.copy()

    w, h = image_size
    if direction == "horizontal":
        keypoints[..., 0] = w - 1 - keypoints[..., 0]
    elif direction == "vertical":
        keypoints[..., 1] = h - 1 - keypoints[..., 1]
    else:
        keypoints = np.asarray([w, h]) - keypoints - 1
    return keypoints, keypoints_visible


def flip_keypoints_custom_center(
    keypoints: np.ndarray,
    keypoints_visible: np.ndarray,
    flip_indices: List[int],
    center_mode: str = "static",
    center_x: float = 0.5,
    center_index: Union[int, List] = 0,
):
    """Horizontal flip around a static x or a root joint (3D pipelines)."""
    assert center_mode in {"static", "root"}
    if center_mode == "static":
        x_c = center_x
    else:
        idx = [center_index] if isinstance(center_index, int) else center_index
        x_c = keypoints[..., idx, 0].mean(axis=-1)

    keypoints_flipped = keypoints.take(flip_indices, axis=-2).copy()
    keypoints_visible_flipped = keypoints_visible.take(flip_indices, axis=-1).copy()
    keypoints_flipped[..., 0] = np.asarray(x_c)[..., None] * 2 - keypoints_flipped[..., 0] \
        if np.ndim(x_c) else x_c * 2 - keypoints_flipped[..., 0]
    return keypoints_flipped, keypoints_visible_flipped


def keypoint_clip_border(
    keypoints: np.ndarray, keypoints_visible: np.ndarray, shape: Tuple[int, int]
) -> Tuple[np.ndarray, np.ndarray]:
    """Zero the visibility of keypoints outside the (w, h) frame."""
    width, height = shape[:2]
    outside_mask = (
        (keypoints[..., 0] > width)
        | (keypoints[..., 0] < 0)
        | (keypoints[..., 1] > height)
        | (keypoints[..., 1] < 0)
    )
    if keypoints_visible.ndim == 2:
        keypoints_visible[outside_mask] = 0.0
    elif keypoints_visible.ndim == 3:
        keypoints_visible[outside_mask, 0] = 0.0
    return keypoints, keypoints_visible


def fix_bbox_aspect_ratio(
    bbox: np.ndarray, aspect_ratio: float = 3 / 4, padding: float = 1.25, bbox_format: str = "xywh"
) -> np.ndarray:
    """Expand boxes to the target aspect ratio about their center, then pad.

    Vectorized equivalent of reference ``keypoints_min_padding.py:68-132``
    (including its quirk: a zero width/height contributes via the ratio test
    with value 1 but the original zero extent is kept for the non-adjusted
    axis).
    """
    assert bbox_format.lower() in ("xywh", "xyxy")
    in_shape = bbox.shape
    bbox = np.asarray(bbox, dtype=np.float64).reshape(-1, 4)

    if bbox_format.lower() == "xywh":
        xyxy = np.stack([bbox[:, 0], bbox[:, 1], bbox[:, 0] + bbox[:, 2], bbox[:, 1] + bbox[:, 3]], axis=1)
    else:
        xyxy = bbox.copy()

    centers = xyxy[:, :2] + (xyxy[:, 2:] - xyxy[:, :2]) / 2
    widths = xyxy[:, 2] - xyxy[:, 0]
    heights = xyxy[:, 3] - xyxy[:, 1]
    widths = np.where(widths == 0, 1.0, widths)
    heights = np.where(heights == 0, 1.0, heights)

    wide = widths / heights > aspect_ratio
    new_widths = np.where(wide, widths, heights * aspect_ratio).astype(np.float32)
    new_heights = np.where(wide, widths / aspect_ratio, heights).astype(np.float32)
    new_widths = new_widths * padding
    new_heights = new_heights * padding

    new_xyxy = np.stack(
        [
            centers[:, 0] - new_widths / 2,
            centers[:, 1] - new_heights / 2,
            centers[:, 0] + new_widths / 2,
            centers[:, 1] + new_heights / 2,
        ],
        axis=1,
    )
    if bbox_format.lower() == "xywh":
        out = np.stack(
            [new_xyxy[:, 0], new_xyxy[:, 1], new_xyxy[:, 2] - new_xyxy[:, 0], new_xyxy[:, 3] - new_xyxy[:, 1]],
            axis=1,
        )
    else:
        out = new_xyxy
    return out.reshape(in_shape)


def find_min_padding_exact(
    bbox: np.ndarray, kpts: np.ndarray, aspect_ratio: float = 3 / 4, bbox_format: str = "xywh"
) -> np.ndarray:
    """Per-keypoint padding factor needed for the (aspect-fixed) bbox to
    contain the keypoint; -1 for invisible keypoints.

    Parity with reference ``keypoints_min_padding.py:4-65``.
    """
    assert bbox_format.lower() in ("xywh", "xyxy")
    kpts = np.asarray(kpts, dtype=np.float64)
    if kpts.size % 2 == 0:
        kpts = kpts.reshape(-1, 2)
        vis = np.ones(kpts.shape[0])
    elif kpts.size % 3 == 0:
        kpts = kpts.reshape(-1, 3)
        vis = kpts[:, 2].flatten()
        kpts = kpts[:, :2]
    else:
        raise ValueError("Keypoints should have 2 or 3 values each")

    bbox = np.asarray(bbox, dtype=np.float64)
    if bbox_format.lower() == "xyxy":
        bbox = np.array([bbox[0], bbox[1], bbox[2] - bbox[0], bbox[3] - bbox[1]])

    if aspect_ratio is not None:
        bbox = fix_bbox_aspect_ratio(bbox, aspect_ratio=aspect_ratio, padding=1.0, bbox_format="xywh")

    bbox = np.asarray(bbox).reshape(-1)[:4]
    x0, y0, w, h = bbox[0], bbox[1], bbox[2], bbox[3]
    x1, y1 = x0 + w, y0 + h
    x_d = np.maximum(np.clip(x0 - kpts[:, 0], 0, None), np.clip(kpts[:, 0] - x1, 0, None))
    y_d = np.maximum(np.clip(y0 - kpts[:, 1], 0, None), np.clip(kpts[:, 1] - y1, 0, None))

    padding = 1 + np.maximum(2 * x_d / w, 2 * y_d / h)
    padding = np.asarray(padding, dtype=np.float64).flatten()
    padding[vis <= 0] = -1.0
    return padding
