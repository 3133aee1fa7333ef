"""Megvii (CPN / MSPN) heatmap codec.

Parity target: reference ``mmpose/codecs/megvii_heatmap.py``: encode places a
one-hot at the integer keypoint cell, gaussian-blurs it and normalizes the
peak to 255; decode blurs, takes argmax, quarter-shifts toward the larger
neighbor, adds the Megvii +0.5 offsets and rescales score by /255 + 0.5.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from probpose_code_tpu.registry import KEYPOINT_CODECS

from scipy.ndimage import correlate1d

from .base import BaseKeypointCodec
from .utils import gaussian_blur, get_heatmap_maximum
from .utils.post_processing import gaussian_kernel1d


@KEYPOINT_CODECS.register_module()
class MegviiHeatmap(BaseKeypointCodec):

    label_mapping_table = dict(keypoint_weights="keypoint_weights")
    field_mapping_table = dict(heatmaps="heatmaps")

    def __init__(self, input_size: Tuple[int, int], heatmap_size: Tuple[int, int], kernel_size: int) -> None:
        super().__init__()
        self.input_size = input_size
        self.heatmap_size = heatmap_size
        self.kernel_size = kernel_size
        self.scale_factor = (np.array(input_size) / heatmap_size).astype(np.float32)

    def encode(self, keypoints: np.ndarray, keypoints_visible: Optional[np.ndarray] = None) -> dict:
        N, K, _ = keypoints.shape
        W, H = self.heatmap_size
        assert N == 1, f"{type(self).__name__} only supports single-instance encoding"
        if keypoints_visible is None:
            keypoints_visible = np.ones((N, K), dtype=np.float32)

        heatmaps = np.zeros((K, H, W), dtype=np.float32)
        keypoint_weights = keypoints_visible.copy()
        k1d = gaussian_kernel1d(self.kernel_size)

        for k in range(K):
            if keypoints_visible[0, k] < 0.5:
                continue
            kx, ky = (keypoints[0, k] / self.scale_factor).astype(np.int64)
            if kx < 0 or kx >= W or ky < 0 or ky >= H:
                keypoint_weights[0, k] = 0
                continue
            heatmaps[k, ky, kx] = 1.0
            # cv2.GaussianBlur default border = reflect-101 == scipy 'mirror'
            blurred = correlate1d(heatmaps[k], k1d, axis=0, mode="mirror")
            heatmaps[k] = correlate1d(blurred, k1d, axis=1, mode="mirror")
            heatmaps[k] = heatmaps[k] / heatmaps[k, ky, kx] * 255.0

        return dict(heatmaps=heatmaps, keypoint_weights=keypoint_weights)

    def decode(self, encoded: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        heatmaps = gaussian_blur(encoded.copy(), self.kernel_size)
        K, H, W = heatmaps.shape
        keypoints, scores = get_heatmap_maximum(heatmaps)

        for k in range(K):
            px, py = int(keypoints[k, 0]), int(keypoints[k, 1])
            if 1 < px < W - 1 and 1 < py < H - 1:
                diff = np.array(
                    [heatmaps[k, py, px + 1] - heatmaps[k, py, px - 1],
                     heatmaps[k, py + 1, px] - heatmaps[k, py - 1, px]]
                )
                keypoints[k] += np.sign(diff) * 0.25 + 0.5
        scores = scores / 255.0 + 0.5
        return keypoints[None] * self.scale_factor, scores[None]
