"""Combined (class + offset) heatmap target generation — vectorized.

Parity with reference ``mmpose/codecs/utils/offset_heatmap.py``
(generate_offset_heatmap): per keypoint a binary disc label map of radius
``radius_factor * max(W, H)`` plus x/y offset maps normalized by that radius.
Instances overwrite in encounter order (reference loops n outer).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def generate_offset_heatmap(
    heatmap_size: Tuple[int, int],
    keypoints: np.ndarray,
    keypoints_visible: np.ndarray,
    radius_factor: float,
) -> Tuple[np.ndarray, np.ndarray]:
    keypoints = np.asarray(keypoints, dtype=np.float64)
    N, K, _ = keypoints.shape
    W, H = heatmap_size

    heatmaps = np.zeros((K, 3, H, W), dtype=np.float32)
    keypoint_weights = keypoints_visible.copy()
    radius = radius_factor * max(W, H)

    xs = np.arange(W, dtype=np.float64)[None, :]
    ys = np.arange(H, dtype=np.float64)[:, None]

    for n in range(N):
        visible = keypoints_visible[n] >= 0.5
        if not visible.any():
            continue
        x_off = np.broadcast_to((keypoints[n, :, 0][:, None, None] - xs[None]) / radius, (K, H, W))
        y_off = np.broadcast_to((keypoints[n, :, 1][:, None, None] - ys[None]) / radius, (K, H, W))
        labels = np.where(x_off**2 + y_off**2 <= 1, 1.0, 0.0)
        stack = np.stack([labels, x_off, y_off], axis=1).astype(np.float32)  # (K, 3, H, W)
        heatmaps[visible] = stack[visible]

    return heatmaps.reshape(K * 3, H, W), keypoint_weights


def generate_displacement_heatmap(
    heatmap_size: Tuple[int, int],
    keypoints: np.ndarray,
    keypoints_visible: np.ndarray,
    roots: np.ndarray,
    roots_visible: np.ndarray,
    diagonal_lengths: np.ndarray,
    radius: float,
):
    """Dense root->keypoint displacement fields (SPR / DEKR).

    Within ``radius`` of each instance root, every pixel stores the
    displacement to each keypoint, weighted by 1/diagonal; overlapping
    instances keep the smaller one (reference offset_heatmap.py tail).
    """
    N, K, _ = keypoints.shape
    W, H = heatmap_size
    displacements = np.zeros((K * 2, H, W), dtype=np.float32)
    displacement_weights = np.zeros((K * 2, H, W), dtype=np.float32)
    instance_size_map = np.zeros((H, W), dtype=np.float32)

    for n in range(N):
        if (
            roots_visible[n] < 1
            or roots[n, 0] < 0
            or roots[n, 1] < 0
            or roots[n, 0] >= W
            or roots[n, 1] >= H
        ):
            continue
        diagonal_length = diagonal_lengths[n]
        start_x = max(int(roots[n, 0] - radius), 0)
        start_y = max(int(roots[n, 1] - radius), 0)
        end_x = min(int(roots[n, 0] + radius), W)
        end_y = min(int(roots[n, 1] + radius), H)
        if end_x <= start_x or end_y <= start_y:
            continue
        ys, xs = np.mgrid[start_y:end_y, start_x:end_x]
        for k in range(K):
            if (
                keypoints_visible[n, k] < 1
                or keypoints[n, k, 0] < 0
                or keypoints[n, k, 1] < 0
                or keypoints[n, k, 0] >= W
                or keypoints[n, k, 1] >= H
            ):
                continue
            region_disp = displacements[2 * k:2 * k + 2, start_y:end_y, start_x:end_x]
            occupied = (region_disp[0] != 0) | (region_disp[1] != 0)
            # keep the existing (smaller) instance where the new one is larger
            keep_old = occupied & (diagonal_length > instance_size_map[start_y:end_y, start_x:end_x])
            write = ~keep_old
            dx = keypoints[n, k, 0] - xs
            dy = keypoints[n, k, 1] - ys
            region_disp[0][write] = dx[write]
            region_disp[1][write] = dy[write]
            w_region = displacement_weights[2 * k:2 * k + 2, start_y:end_y, start_x:end_x]
            w_region[0][write] = 1 / diagonal_length
            w_region[1][write] = 1 / diagonal_length
            instance_size_map[start_y:end_y, start_x:end_x][write] = diagonal_length

    return displacements, displacement_weights
