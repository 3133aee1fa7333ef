"""Instance-level property helpers (roots, pseudo-bboxes, diagonals).

Parity target: reference ``mmpose/codecs/utils/instance_property.py`` —
used by the SPR / DEKR bottom-up codecs.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def get_instance_bbox(keypoints: np.ndarray, keypoints_visible: Optional[np.ndarray] = None) -> np.ndarray:
    """Tight xyxy bbox of the visible keypoints per instance (N, 4)."""
    bbox = np.zeros((keypoints.shape[0], 4), dtype=np.float32)
    for i in range(keypoints.shape[0]):
        vis = keypoints[i] if keypoints_visible is None else keypoints[i][keypoints_visible[i] > 0]
        if vis.size == 0:
            continue
        bbox[i, :2] = vis.min(axis=0)
        bbox[i, 2:] = vis.max(axis=0)
    return bbox


def get_instance_root(
    keypoints: np.ndarray,
    keypoints_visible: Optional[np.ndarray] = None,
    root_type: str = "kpt_center",
) -> Tuple[np.ndarray, np.ndarray]:
    """Instance root coordinates (kpt mean or bbox center) + visibility."""
    roots = np.zeros((keypoints.shape[0], 2), dtype=np.float32)
    roots_visible = np.ones(keypoints.shape[0], dtype=np.float32) * 2
    for i in range(keypoints.shape[0]):
        vis = keypoints[i] if keypoints_visible is None else keypoints[i][keypoints_visible[i] > 0]
        if vis.size == 0:
            roots_visible[i] = 0
            continue
        if root_type == "kpt_center":
            roots[i] = vis.mean(axis=0)
        elif root_type == "bbox_center":
            roots[i] = (vis.max(axis=0) + vis.min(axis=0)) / 2.0
        else:
            raise ValueError(f"invalid root_type {root_type}")
        roots_visible[i] = 1
    return roots, roots_visible


def get_diagonal_lengths(keypoints: np.ndarray, keypoints_visible: Optional[np.ndarray] = None) -> np.ndarray:
    """Diagonal of the visible-keypoint pseudo-bbox per instance (N,)."""
    bbox = get_instance_bbox(keypoints, keypoints_visible).reshape(-1, 2, 2)
    hw = bbox[:, 1] - bbox[:, 0]
    return np.sqrt((hw**2).sum(axis=1))
