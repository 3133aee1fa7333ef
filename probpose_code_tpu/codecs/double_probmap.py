"""DoubleProbMap codec — dual expected-OKS maps with different paddings.

Parity target: reference ``mmpose/codecs/double_probmap.py`` (encode:152,
decode:257): two OKS map sets over differently-padded activation windows
("in" = tight window, "out" = expanded window) so the head can supervise
out-of-image keypoints on the wider map. Coordinate mapping goes through
each window's top-left / scale (``_kpts_to_activation_pts:121``,
``activation_pts_to_kpts:136``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from probpose_code_tpu.registry import KEYPOINT_CODECS

from .base import BaseKeypointCodec
from .utils import (
    generate_offset_heatmap,
    generate_probmaps,
    get_heatmap_expected_value,
    get_heatmap_maximum,
)


@KEYPOINT_CODECS.register_module()
class DoubleProbMap(BaseKeypointCodec):

    auxiliary_encode_keys = {"keypoints_visibility"}
    label_mapping_table = dict(keypoint_weights="keypoint_weights")
    field_mapping_table = dict(heatmaps="heatmaps")

    def __init__(
        self,
        input_size: Tuple[int, int],
        heatmap_size: Tuple[int, int],
        heatmap_type: str = "gaussian",
        sigma: float = -1,
        radius_factor: float = 0.0546875,
        blur_kernel_size: int = 11,
        in_heatmap_padding: float = 1.0,
        out_heatmap_padding: float = 1.25,
        increase_sigma_with_padding: bool = False,
    ) -> None:
        super().__init__()
        if heatmap_type not in ("gaussian", "combined"):
            raise ValueError(f"invalid heatmap_type {heatmap_type}")
        self.input_size = input_size
        self.heatmap_size = heatmap_size
        self.heatmap_type = heatmap_type
        self.sigma = sigma
        self.radius_factor = radius_factor
        self.blur_kernel_size = blur_kernel_size

        self.input_center = np.array(input_size) / 2
        self.input_wh = np.array(input_size)
        self.in_heatmap_padding = in_heatmap_padding
        self.out_heatmap_padding = out_heatmap_padding

        self.in_activation_map_wh = self.input_wh * in_heatmap_padding
        self.out_activation_map_wh = self.input_wh * out_heatmap_padding
        self.in_activation_map_tl = self.input_center - self.in_activation_map_wh / 2
        self.out_activation_map_tl = self.input_center - self.out_activation_map_wh / 2

        self.in_scale_factor = ((self.in_activation_map_wh - 1) / (np.array(heatmap_size) - 1)).astype(np.float32)
        self.out_scale_factor = ((self.out_activation_map_wh - 1) / (np.array(heatmap_size) - 1)).astype(np.float32)

    def _kpts_to_activation_pts(self, keypoints: np.ndarray, htm_type: str = "in") -> np.ndarray:
        top_left = self.in_activation_map_tl if htm_type == "in" else self.out_activation_map_tl
        scale = self.in_scale_factor if htm_type == "in" else self.out_scale_factor
        return (keypoints - top_left) / scale

    def activation_pts_to_kpts(self, keypoints: np.ndarray, htm_type: str = "in") -> np.ndarray:
        top_left = self.in_activation_map_tl if htm_type == "in" else self.out_activation_map_tl
        input_size = self.in_activation_map_wh if htm_type == "in" else self.out_activation_map_wh
        W, H = self.heatmap_size
        return keypoints / [W - 1, H - 1] * input_size + top_left

    def encode(
        self,
        keypoints: np.ndarray,
        keypoints_visible: Optional[np.ndarray] = None,
        id_similarity: float = 0.0,
        keypoints_visibility: Optional[np.ndarray] = None,
    ) -> dict:
        assert keypoints.shape[0] == 1, f"{type(self).__name__} only supports single-instance encoding"
        if keypoints_visibility is None:
            keypoints_visibility = np.zeros(keypoints.shape[:2], dtype=np.float32)
        if keypoints_visible is None:
            keypoints_visible = np.ones(keypoints.shape[:2], dtype=np.float32)

        if self.heatmap_type == "gaussian":
            heatmaps, keypoint_weights = generate_probmaps(
                self.heatmap_size, self._kpts_to_activation_pts(keypoints, "in"), keypoints_visible, self.sigma
            )
            out_heatmaps, out_kpt_weights = generate_probmaps(
                self.heatmap_size, self._kpts_to_activation_pts(keypoints, "out"), keypoints_visible, self.sigma
            )
        else:
            heatmaps, keypoint_weights = generate_offset_heatmap(
                self.heatmap_size,
                self._kpts_to_activation_pts(keypoints, "in"),
                keypoints_visible,
                self.radius_factor,
            )
            out_heatmaps, out_kpt_weights = generate_offset_heatmap(
                self.heatmap_size,
                self._kpts_to_activation_pts(keypoints, "out"),
                keypoints_visible,
                self.radius_factor,
            )

        annotated = keypoints_visible > 0
        out_pts = self._kpts_to_activation_pts(keypoints, "out")
        in_image = (
            (out_pts[:, :, 0] >= 0)
            & (out_pts[:, :, 0] < self.heatmap_size[0])
            & (out_pts[:, :, 1] >= 0)
            & (out_pts[:, :, 1] < self.heatmap_size[1])
        )

        return dict(
            heatmaps=heatmaps,
            keypoint_weights=keypoint_weights,
            out_heatmaps=out_heatmaps[None],
            out_kpt_weights=out_kpt_weights,
            annotated=annotated,
            in_image=in_image,
            keypoints_scaled=keypoints,
            identification_similarity=id_similarity,
        )

    def decode(self, encoded: np.ndarray, htm_type: str = "out") -> Tuple[np.ndarray, np.ndarray]:
        assert htm_type in ("in", "out")
        heatmaps = encoded.copy()

        if self.heatmap_type == "gaussian":
            keypoints, scores = get_heatmap_expected_value(heatmaps)
            keypoints = keypoints[None]
            scores = scores[None]
        else:
            from .utils import gaussian_kernel1d
            from .utils.post_processing import _blur2d_zeropad

            _K, H, W = heatmaps.shape
            K = _K // 3
            ks = 2 * self.blur_kernel_size + 1
            k1d = gaussian_kernel1d(ks)
            for idx in range(0, _K, 3):
                heatmaps[idx] = _blur2d_zeropad(heatmaps[idx], k1d)
            radius = self.radius_factor * max(W, H)
            x_offset = heatmaps[1::3].reshape(-1) * radius
            y_offset = heatmaps[2::3].reshape(-1) * radius
            keypoints, scores = get_heatmap_maximum(heatmaps=heatmaps[::3])
            index = (keypoints[..., 0] + keypoints[..., 1] * W).reshape(-1)
            index = (index + W * H * np.arange(K)).astype(int)
            keypoints = keypoints + np.stack((x_offset[index], y_offset[index]), axis=-1)
            keypoints = keypoints[None].astype(np.float32)
            scores = scores[None]

        keypoints = self.activation_pts_to_kpts(keypoints, htm_type=htm_type)
        return keypoints, scores
