"""MSRA heatmap codec (reference ``mmpose/codecs/msra_heatmap.py``).

Classic SimpleBaselines gaussians with ``scale = input_size / heatmap_size``.
``unbiased=True`` selects the DARK encode (full-map sub-pixel gaussian) and
DARK decode (modulated log-Taylor); otherwise biased encode + quarter-offset
refine.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from probpose_code_tpu.registry import KEYPOINT_CODECS

from .base import BaseKeypointCodec
from .utils import (
    generate_gaussian_heatmaps,
    generate_unbiased_gaussian_heatmaps,
    get_heatmap_maximum,
    refine_keypoints,
    refine_keypoints_dark,
)


@KEYPOINT_CODECS.register_module()
class MSRAHeatmap(BaseKeypointCodec):

    label_mapping_table = dict(keypoint_weights="keypoint_weights")
    field_mapping_table = dict(heatmaps="heatmaps")

    def __init__(
        self,
        input_size: Tuple[int, int],
        heatmap_size: Tuple[int, int],
        sigma: float,
        unbiased: bool = False,
        blur_kernel_size: int = 11,
    ) -> None:
        super().__init__()
        self.input_size = input_size
        self.heatmap_size = heatmap_size
        self.sigma = sigma
        self.unbiased = unbiased
        self.blur_kernel_size = blur_kernel_size
        self.scale_factor = (np.array(input_size) / heatmap_size).astype(np.float32)

    def encode(self, keypoints: np.ndarray, keypoints_visible: Optional[np.ndarray] = None) -> dict:
        assert keypoints.shape[0] == 1, f"{type(self).__name__} only supports single-instance encoding"
        if keypoints_visible is None:
            keypoints_visible = np.ones(keypoints.shape[:2], dtype=np.float32)

        gen = generate_unbiased_gaussian_heatmaps if self.unbiased else generate_gaussian_heatmaps
        heatmaps, keypoint_weights = gen(
            heatmap_size=self.heatmap_size,
            keypoints=keypoints / self.scale_factor,
            keypoints_visible=keypoints_visible,
            sigma=self.sigma,
        )
        return dict(heatmaps=heatmaps, keypoint_weights=keypoint_weights)

    def decode(self, encoded: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        heatmaps = encoded.copy()
        keypoints, scores = get_heatmap_maximum(heatmaps)
        keypoints, scores = keypoints[None], scores[None]

        if self.unbiased:
            keypoints = refine_keypoints_dark(keypoints, heatmaps, blur_kernel_size=self.blur_kernel_size)
        else:
            keypoints = refine_keypoints(keypoints, heatmaps)

        keypoints = keypoints * self.scale_factor
        return keypoints, scores
