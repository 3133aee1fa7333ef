"""UDP heatmap codec (reference ``mmpose/codecs/udp_heatmap.py``).

Encode: UDP sub-pixel gaussians on a pixel-grid-aligned heatmap
(``scale = (input_size - 1) / (heatmap_size - 1)``); decode: argmax +
DARK-UDP refinement, rescaled by ``/ (heatmap_size-1) * input_size`` — note
the reference multiplies by ``input_size`` (not ``input_size - 1``) on the
way out, and this codec reproduces that.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from probpose_code_tpu.registry import KEYPOINT_CODECS

from .base import BaseKeypointCodec
from .utils import (
    generate_offset_heatmap,
    generate_udp_gaussian_heatmaps,
    get_heatmap_maximum,
    refine_keypoints_dark_udp,
)


@KEYPOINT_CODECS.register_module()
class UDPHeatmap(BaseKeypointCodec):

    label_mapping_table = dict(keypoint_weights="keypoint_weights")
    field_mapping_table = dict(heatmaps="heatmaps")

    def __init__(
        self,
        input_size: Tuple[int, int],
        heatmap_size: Tuple[int, int],
        heatmap_type: str = "gaussian",
        sigma: float = 2.0,
        radius_factor: float = 0.0546875,
        blur_kernel_size: int = 11,
    ) -> None:
        super().__init__()
        if heatmap_type not in {"gaussian", "combined"}:
            raise ValueError(f"invalid heatmap_type {heatmap_type}")
        self.input_size = input_size
        self.heatmap_size = heatmap_size
        self.heatmap_type = heatmap_type
        self.sigma = sigma
        self.radius_factor = radius_factor
        self.blur_kernel_size = blur_kernel_size
        self.scale_factor = ((np.array(input_size) - 1) / (np.array(heatmap_size) - 1)).astype(np.float32)

    def encode(self, keypoints: np.ndarray, keypoints_visible: Optional[np.ndarray] = None) -> dict:
        assert keypoints.shape[0] == 1, f"{type(self).__name__} only supports single-instance encoding"
        if keypoints_visible is None:
            keypoints_visible = np.ones(keypoints.shape[:2], dtype=np.float32)

        if self.heatmap_type == "gaussian":
            heatmaps, keypoint_weights = generate_udp_gaussian_heatmaps(
                heatmap_size=self.heatmap_size,
                keypoints=keypoints / self.scale_factor,
                keypoints_visible=keypoints_visible,
                sigma=self.sigma,
            )
        else:
            heatmaps, keypoint_weights = generate_offset_heatmap(
                heatmap_size=self.heatmap_size,
                keypoints=keypoints / self.scale_factor,
                keypoints_visible=keypoints_visible,
                radius_factor=self.radius_factor,
            )
        return dict(heatmaps=heatmaps, keypoint_weights=keypoint_weights)

    def decode(self, encoded: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        heatmaps = encoded.copy()

        if self.heatmap_type == "gaussian":
            keypoints, scores = get_heatmap_maximum(heatmaps)
            keypoints = keypoints[None]
            scores = scores[None]
            keypoints = refine_keypoints_dark_udp(keypoints, heatmaps, blur_kernel_size=self.blur_kernel_size)
        else:
            from .utils import gaussian_kernel1d
            from .utils.post_processing import _blur2d_zeropad

            _K, H_, W_ = heatmaps.shape
            K = _K // 3
            ks = 2 * self.blur_kernel_size + 1
            k1d = gaussian_kernel1d(ks)
            for idx in range(0, _K, 3):
                heatmaps[idx] = _blur2d_zeropad(heatmaps[idx], k1d)
            radius = self.radius_factor * max(W_, H_)
            x_offset = heatmaps[1::3].reshape(-1) * radius
            y_offset = heatmaps[2::3].reshape(-1) * radius
            keypoints, scores = get_heatmap_maximum(heatmaps=heatmaps[::3])
            index = (keypoints[..., 0] + keypoints[..., 1] * W_).reshape(-1)
            index = (index + W_ * H_ * np.arange(K)).astype(int)
            keypoints = keypoints + np.stack((x_offset[index], y_offset[index]), axis=-1)
            keypoints = keypoints[None].astype(np.float32)
            scores = scores[None]

        W, H = self.heatmap_size
        keypoints = keypoints / [W - 1, H - 1] * self.input_size
        return keypoints, scores
