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
