"""ProbMap family of codecs (ProbPose CVPR 2025).

Parity targets:
- ``ProbMap`` — reference ``mmpose/codecs/probmap.py:20`` (encode:98 builds
  expected-OKS maps; decode:170 expected-value decode via OKS-kernel
  convolution + sub-pixel Taylor; output scaled to input space :218).
- ``ArgMaxProbMap`` — reference ``mmpose/codecs/argmax_probmap.py`` (same
  encode; decode:172 argmax + DARK-UDP refinement). Used as the head's fast
  decoder for on-the-fly OKS / error targets.
- ``UDPExpMaxHeatmap`` — reference ``mmpose/codecs/udp_expmax_heatmap.py``
  (UDP gaussian encode + expected-value decode hybrid).

Both emit the ProbPose auxiliary annotations (``annotated``, ``in_image``)
consumed by the probability / visibility branches of ProbMapHead.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from probpose_code_tpu.registry import KEYPOINT_CODECS

from .base import BaseKeypointCodec
from .utils import (
    gaussian_blur,
    generate_offset_heatmap,
    generate_probmaps,
    generate_udp_gaussian_heatmaps,
    get_heatmap_expected_value,
    get_heatmap_maximum,
    refine_keypoints_dark_udp,
)


class _ProbMapEncodeMixin:
    """Shared expected-OKS encode + auxiliary annotations."""

    def _encode_probmap(
        self,
        keypoints: np.ndarray,
        keypoints_visible: Optional[np.ndarray],
        id_similarity: float,
        keypoints_visibility: Optional[np.ndarray],
    ) -> dict:
        assert keypoints.shape[0] == 1, f"{type(self).__name__} only supports single-instance encoding"

        if keypoints_visibility is None:
            keypoints_visibility = np.zeros(keypoints.shape[:2], dtype=np.float32)
        if keypoints_visible is None:
            keypoints_visible = np.ones(keypoints.shape[:2], dtype=np.float32)

        heatmaps, keypoint_weights = generate_probmaps(
            heatmap_size=self.heatmap_size,
            keypoints=keypoints / self.scale_factor,
            keypoints_visible=keypoints_visible,
            sigma=self.sigma,
        )

        annotated = keypoints_visible > 0
        in_image = (
            (keypoints[:, :, 0] >= 0)
            & (keypoints[:, :, 0] < self.input_size[0])
            & (keypoints[:, :, 1] >= 0)
            & (keypoints[:, :, 1] < self.input_size[1])
        )

        return dict(
            heatmaps=heatmaps,
            keypoint_weights=keypoint_weights,
            annotated=annotated,
            in_image=in_image,
            keypoints_scaled=keypoints,
            heatmap_keypoints=keypoints / self.scale_factor,
            identification_similarity=id_similarity,
        )


@KEYPOINT_CODECS.register_module()
class ProbMap(BaseKeypointCodec, _ProbMapEncodeMixin):
    """Per-pixel expected-OKS maps with expected-value decode."""

    auxiliary_encode_keys = {"keypoints_visibility"}
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
        increase_sigma_with_padding: bool = False,
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
        self.increase_sigma_with_padding = increase_sigma_with_padding
        self.scale_factor = ((np.array(input_size) - 1) / (np.array(heatmap_size) - 1)).astype(np.float32)

    def encode(
        self,
        keypoints: np.ndarray,
        keypoints_visible: Optional[np.ndarray] = None,
        id_similarity: float = 0.0,
        keypoints_visibility: Optional[np.ndarray] = None,
    ) -> dict:
        return self._encode_probmap(keypoints, keypoints_visible, id_similarity, keypoints_visibility)

    def decode(self, encoded: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Expected-OKS decode of (K, H, W) heatmaps -> input-space kpts."""
        heatmaps = encoded.copy()
        W, H = self.heatmap_size

        if self.heatmap_type == "gaussian":
            keypoints, scores = get_heatmap_expected_value(heatmaps)
            keypoints = keypoints[None]
            scores = scores[None]
        else:  # combined
            _K, H_, W_ = heatmaps.shape
            K = _K // 3
            from .utils import gaussian_kernel1d
            from .utils.post_processing import _blur2d_zeropad

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

        keypoints = keypoints / [W - 1, H - 1] * self.input_size
        return keypoints, scores


@KEYPOINT_CODECS.register_module()
class ArgMaxProbMap(BaseKeypointCodec, _ProbMapEncodeMixin):
    """ProbMap targets with fast argmax + DARK-UDP decode."""

    auxiliary_encode_keys = {"keypoints_visibility"}

    def __init__(
        self,
        input_size: Tuple[int, int],
        heatmap_size: Tuple[int, int],
        heatmap_type: str = "gaussian",
        sigma: float = -1,
        radius_factor: float = 0.0546875,
        blur_kernel_size: int = 11,
        increase_sigma_with_padding: bool = False,
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
        self.increase_sigma_with_padding = increase_sigma_with_padding
        self.scale_factor = ((np.array(input_size) - 1) / (np.array(heatmap_size) - 1)).astype(np.float32)

    def encode(
        self,
        keypoints: np.ndarray,
        keypoints_visible: Optional[np.ndarray] = None,
        id_similarity: float = 0.0,
        keypoints_visibility: Optional[np.ndarray] = None,
    ) -> dict:
        enc = self._encode_probmap(keypoints, keypoints_visible, id_similarity, keypoints_visibility)
        enc.pop("heatmap_keypoints", None)  # reference ArgMaxProbMap omits it
        return enc

    def decode(self, encoded: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        heatmaps = encoded.copy()
        W, H = self.heatmap_size

        keypoints_max, scores = get_heatmap_maximum(heatmaps)
        keypoints_max = keypoints_max[None]
        scores = scores[None]
        keypoints = refine_keypoints_dark_udp(
            keypoints_max.copy(), heatmaps, blur_kernel_size=self.blur_kernel_size
        )
        keypoints = keypoints / [W - 1, H - 1] * self.input_size
        return keypoints, scores


@KEYPOINT_CODECS.register_module()
class UDPExpMaxHeatmap(BaseKeypointCodec):
    """UDP gaussian encode + expected-OKS-value decode hybrid
    (reference ``mmpose/codecs/udp_expmax_heatmap.py:110,202``)."""

    auxiliary_encode_keys = {"keypoints_visibility"}

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
        self.input_size = input_size
        self.heatmap_size = heatmap_size
        self.heatmap_type = heatmap_type
        self.sigma = sigma
        self.radius_factor = radius_factor
        self.blur_kernel_size = blur_kernel_size
        self.scale_factor = ((np.array(input_size) - 1) / (np.array(heatmap_size) - 1)).astype(np.float32)

    def encode(
        self,
        keypoints: np.ndarray,
        keypoints_visible: Optional[np.ndarray] = None,
        id_similarity: float = 0.0,
        keypoints_visibility: Optional[np.ndarray] = None,
    ) -> dict:
        assert keypoints.shape[0] == 1
        if keypoints_visibility is None:
            keypoints_visibility = np.zeros(keypoints.shape[:2], dtype=np.float32)
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

        annotated = keypoints_visible > 0
        in_image = (
            (keypoints[:, :, 0] >= 0)
            & (keypoints[:, :, 0] < self.input_size[0])
            & (keypoints[:, :, 1] >= 0)
            & (keypoints[:, :, 1] < self.input_size[1])
        )
        return dict(
            heatmaps=heatmaps,
            keypoint_weights=keypoint_weights,
            annotated=annotated,
            in_image=in_image,
            keypoints_scaled=keypoints,
            identification_similarity=id_similarity,
        )

    def decode(self, encoded: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        heatmaps = encoded.copy()
        W, H = self.heatmap_size
        keypoints, scores = get_heatmap_expected_value(heatmaps)
        keypoints = keypoints[None]
        scores = scores[None]
        keypoints = keypoints / [W - 1, H - 1] * self.input_size
        return keypoints, scores
