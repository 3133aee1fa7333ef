"""SKPS codec: unbiased gaussian heatmaps + dense x/y offset fields.

Parity target: reference ``projects/skps/custom_codecs/skps_heatmap.py`` —
encode stores, for every heatmap cell, the (x, y) distance to each keypoint
(a (2K, H, W) field); decode reads the offset at each heatmap argmax to get
sub-pixel coordinates. The reference's per-keypoint decode loop (:140-147)
is vectorized here.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from probpose_code_tpu.codecs.base import BaseKeypointCodec
from probpose_code_tpu.codecs.utils.gaussian_heatmap import generate_unbiased_gaussian_heatmaps
from probpose_code_tpu.codecs.utils.post_processing import get_heatmap_maximum
from probpose_code_tpu.registry import KEYPOINT_CODECS


@KEYPOINT_CODECS.register_module()
class SKPSHeatmap(BaseKeypointCodec):
    def __init__(self, input_size: Tuple[int, int], heatmap_size: Tuple[int, int], sigma: float):
        super().__init__()
        self.input_size = input_size
        self.heatmap_size = heatmap_size
        self.sigma = sigma
        self.scale_factor = (np.array(input_size) / heatmap_size).astype(np.float32)
        W, H = heatmap_size
        self.y_range, self.x_range = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")

    def encode(self, keypoints: np.ndarray, keypoints_visible: Optional[np.ndarray] = None) -> dict:
        assert keypoints.shape[0] == 1, "SKPSHeatmap is single-instance (topdown crops)"
        if keypoints_visible is None:
            keypoints_visible = np.ones(keypoints.shape[:2], dtype=np.float32)
        kpts_hm = keypoints / self.scale_factor
        heatmaps, keypoint_weights = generate_unbiased_gaussian_heatmaps(
            heatmap_size=self.heatmap_size, keypoints=kpts_hm,
            keypoints_visible=keypoints_visible, sigma=self.sigma,
        )
        k = kpts_hm[0]
        offset_x = k[:, 0] - self.x_range[..., None]  # (H, W, K)
        offset_y = k[:, 1] - self.y_range[..., None]
        displacements = np.transpose(
            np.concatenate([offset_x, offset_y], axis=-1), (2, 0, 1)
        ).astype(np.float32)  # (2K, H, W)
        return dict(heatmaps=heatmaps, keypoint_weights=keypoint_weights[0], displacements=displacements)

    def decode(self, encoded: np.ndarray, offset_maps: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        K, H, W = encoded.shape
        locs, scores = get_heatmap_maximum(encoded.copy())
        xi = np.clip(locs[:, 0].astype(np.int32), 0, W - 1)
        yi = np.clip(locs[:, 1].astype(np.int32), 0, H - 1)
        xi[locs[:, 0] < 0] = 0
        yi[locs[:, 1] < 0] = 0
        ks = np.arange(K)
        kpts = np.stack([
            xi + offset_maps[:K][ks, yi, xi],
            yi + offset_maps[K:][ks, yi, xi],
        ], axis=-1).astype(np.float32)
        return (kpts * self.scale_factor)[None], scores[None]
