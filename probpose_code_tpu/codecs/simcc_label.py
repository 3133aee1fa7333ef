"""SimCC label codec (reference ``mmpose/codecs/simcc_label.py``).

1-D x/y classification vectors at ``simcc_split_ratio`` sub-pixel bins.
Gaussian smoothing is vectorized; decode is joint argmax with optional
1-D DARK refinement and optional softmax-visibility.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import numpy as np

from probpose_code_tpu.registry import KEYPOINT_CODECS

from .base import BaseKeypointCodec
from .utils import get_simcc_maximum, refine_simcc_dark


@KEYPOINT_CODECS.register_module()
class SimCCLabel(BaseKeypointCodec):

    auxiliary_encode_keys = set()
    label_mapping_table = dict(
        keypoint_x_labels="keypoint_x_labels",
        keypoint_y_labels="keypoint_y_labels",
        keypoint_weights="keypoint_weights",
    )

    def __init__(
        self,
        input_size: Tuple[int, int],
        smoothing_type: str = "gaussian",
        sigma: Union[float, int, Tuple[float, float]] = 6.0,
        simcc_split_ratio: float = 2.0,
        label_smooth_weight: float = 0.0,
        normalize: bool = True,
        use_dark: bool = False,
        decode_visibility: bool = False,
        decode_beta: float = 150.0,
    ) -> None:
        super().__init__()
        if smoothing_type not in {"gaussian", "standard"}:
            raise ValueError(f"invalid smoothing_type {smoothing_type}")
        if smoothing_type == "gaussian" and label_smooth_weight > 0:
            raise ValueError("label_smooth_weight only applies to 'standard' smoothing")
        if not 0.0 <= label_smooth_weight <= 1.0:
            raise ValueError("label_smooth_weight should be in [0, 1]")

        self.input_size = input_size
        self.smoothing_type = smoothing_type
        self.simcc_split_ratio = simcc_split_ratio
        self.label_smooth_weight = label_smooth_weight
        self.normalize = normalize
        self.use_dark = use_dark
        self.decode_visibility = decode_visibility
        self.decode_beta = decode_beta
        self.sigma = np.array([sigma, sigma]) if isinstance(sigma, (float, int)) else np.array(sigma)

    # -- encode -----------------------------------------------------------

    def encode(self, keypoints: np.ndarray, keypoints_visible: Optional[np.ndarray] = None) -> dict:
        if keypoints_visible is None:
            keypoints_visible = np.ones(keypoints.shape[:2], dtype=np.float32)

        if self.smoothing_type == "gaussian":
            x_labels, y_labels, keypoint_weights = self._generate_gaussian(keypoints, keypoints_visible)
        else:
            x_labels, y_labels, keypoint_weights = self._generate_standard(keypoints, keypoints_visible)

        return dict(
            keypoint_x_labels=x_labels,
            keypoint_y_labels=y_labels,
            keypoint_weights=keypoint_weights,
        )

    def _split_sizes(self) -> Tuple[int, int]:
        w, h = self.input_size
        W = int(np.around(w * self.simcc_split_ratio))
        H = int(np.around(h * self.simcc_split_ratio))
        return W, H

    def _generate_standard(self, keypoints, keypoints_visible):
        N, K, _ = keypoints.shape
        W, H = self._split_sizes()
        kpts = np.around(keypoints * self.simcc_split_ratio).astype(np.int64)
        keypoint_weights = keypoints_visible.copy()

        target_x = np.zeros((N, K, W), dtype=np.float32)
        target_y = np.zeros((N, K, H), dtype=np.float32)

        visible = keypoints_visible >= 0.5
        in_bounds = (kpts[..., 0] >= 0) & (kpts[..., 0] < W) & (kpts[..., 1] >= 0) & (kpts[..., 1] < H)
        keypoint_weights[visible & ~in_bounds] = 0
        active = visible & in_bounds

        n_idx, k_idx = np.nonzero(active)
        if self.label_smooth_weight > 0:
            target_x[n_idx, k_idx] = self.label_smooth_weight / (W - 1)
            target_y[n_idx, k_idx] = self.label_smooth_weight / (H - 1)
        target_x[n_idx, k_idx, kpts[n_idx, k_idx, 0]] = 1.0 - self.label_smooth_weight
        target_y[n_idx, k_idx, kpts[n_idx, k_idx, 1]] = 1.0 - self.label_smooth_weight
        return target_x, target_y, keypoint_weights

    def _generate_gaussian(self, keypoints, keypoints_visible):
        N, K, _ = keypoints.shape
        W, H = self._split_sizes()
        kpts = np.around(keypoints * self.simcc_split_ratio).astype(np.int64)
        keypoint_weights = keypoints_visible.copy()

        radius = self.sigma * 3
        visible = keypoints_visible >= 0.5
        left_top = kpts - radius
        right_bottom = kpts + radius + 1
        out_of_bounds = (
            (left_top[..., 0] >= W) | (left_top[..., 1] >= H) | (right_bottom[..., 0] < 0) | (right_bottom[..., 1] < 0)
        )
        keypoint_weights[visible & out_of_bounds] = 0
        active = visible & ~out_of_bounds

        xs = np.arange(W, dtype=np.float32)
        ys = np.arange(H, dtype=np.float32)
        gx = np.exp(-((xs[None, None] - kpts[..., 0][..., None]) ** 2) / (2 * self.sigma[0] ** 2))
        gy = np.exp(-((ys[None, None] - kpts[..., 1][..., None]) ** 2) / (2 * self.sigma[1] ** 2))
        target_x = np.where(active[..., None], gx, 0.0).astype(np.float32)
        target_y = np.where(active[..., None], gy, 0.0).astype(np.float32)

        if self.normalize:
            norm_value = self.sigma * np.sqrt(np.pi * 2)
            target_x /= np.float32(norm_value[0])
            target_y /= np.float32(norm_value[1])
        return target_x, target_y, keypoint_weights

    # -- decode -----------------------------------------------------------

    def decode(self, simcc_x: np.ndarray, simcc_y: np.ndarray):
        keypoints, scores = get_simcc_maximum(simcc_x, simcc_y)
        if keypoints.ndim == 2:
            keypoints = keypoints[None, :]
            scores = scores[None, :]

        if self.use_dark:
            x_blur = int((self.sigma[0] * 20 - 7) // 3)
            y_blur = int((self.sigma[1] * 20 - 7) // 3)
            x_blur -= int((x_blur % 2) == 0)
            y_blur -= int((y_blur % 2) == 0)
            sx = simcc_x if simcc_x.ndim == 3 else simcc_x[None]
            sy = simcc_y if simcc_y.ndim == 3 else simcc_y[None]
            keypoints[:, :, 0] = refine_simcc_dark(keypoints[:, :, 0], sx, x_blur)
            keypoints[:, :, 1] = refine_simcc_dark(keypoints[:, :, 1], sy, y_blur)

        keypoints /= self.simcc_split_ratio

        if self.decode_visibility:
            _, visibility = get_simcc_maximum(
                simcc_x * self.decode_beta * self.sigma[0],
                simcc_y * self.decode_beta * self.sigma[1],
                apply_softmax=True,
            )
            return keypoints, (scores, visibility)
        return keypoints, scores
