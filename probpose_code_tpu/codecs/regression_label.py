"""Normalized-coordinate regression codec
(reference ``mmpose/codecs/regression_label.py``).

Encode: keypoints normalized by input size, weight 1 only for visible
in-bounds points. Decode: denormalize; 4-channel outputs carry RLE-style
per-axis sigma and score = mean(1 - sigma).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from probpose_code_tpu.registry import KEYPOINT_CODECS

from .base import BaseKeypointCodec


@KEYPOINT_CODECS.register_module()
class RegressionLabel(BaseKeypointCodec):

    label_mapping_table = dict(
        keypoint_labels="keypoint_labels",
        keypoint_weights="keypoint_weights",
    )

    def __init__(self, input_size: Tuple[int, int]) -> None:
        super().__init__()
        self.input_size = input_size

    def encode(self, keypoints: np.ndarray, keypoints_visible: Optional[np.ndarray] = None) -> dict:
        if keypoints_visible is None:
            keypoints_visible = np.ones(keypoints.shape[:2], dtype=np.float32)

        w, h = self.input_size
        valid = ((keypoints >= 0) & (keypoints <= [w - 1, h - 1])).all(axis=-1) & (keypoints_visible > 0.5)
        keypoint_labels = (keypoints / np.array([w, h])).astype(np.float32)
        keypoint_weights = np.where(valid, 1.0, 0.0).astype(np.float32)
        return dict(keypoint_labels=keypoint_labels, keypoint_weights=keypoint_weights)

    def decode(self, encoded: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        if encoded.shape[-1] == 2:
            N, K, _ = encoded.shape
            normalized_coords = encoded.copy()
            scores = np.ones((N, K), dtype=np.float32)
        elif encoded.shape[-1] == 4:
            normalized_coords = encoded[..., :2].copy()
            output_sigma = encoded[..., 2:4].copy()
            scores = (1 - output_sigma).mean(axis=-1)
        else:
            raise ValueError(f"Keypoint dim should be 2 or 4, got {encoded.shape[-1]}")

        w, h = self.input_size
        keypoints = normalized_coords * np.array([w, h])
        return keypoints, scores
