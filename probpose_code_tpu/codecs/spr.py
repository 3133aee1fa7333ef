"""SPR codec — Single-stage Pose Regression (root heatmap + displacements).

Parity target: reference ``mmpose/codecs/spr.py`` (300 LoC): encode builds a
root-center gaussian (optionally per-keypoint gaussians too) and dense
root->keypoint displacement fields; decode NMS-filters the root heatmap,
takes top instances, reads their pose from the displacement field, and
scores keypoints by bilinear sampling of the keypoint heatmaps.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import numpy as np

from probpose_code_tpu.registry import KEYPOINT_CODECS

from .base import BaseKeypointCodec
from .utils import generate_gaussian_heatmaps
from .utils.instance_property import get_diagonal_lengths, get_instance_root
from .utils.offset_heatmap import generate_displacement_heatmap


def _bilinear_sample(maps: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Border-padded bilinear sampling of (C, H, W) maps at float coords."""
    C, H, W = maps.shape
    x = np.clip(x, 0, W - 1)
    y = np.clip(y, 0, H - 1)
    x0 = np.floor(x).astype(int)
    y0 = np.floor(y).astype(int)
    x1 = np.clip(x0 + 1, 0, W - 1)
    y1 = np.clip(y0 + 1, 0, H - 1)
    fx = x - x0
    fy = y - y0
    v00 = maps[:, y0, x0]
    v01 = maps[:, y0, x1]
    v10 = maps[:, y1, x0]
    v11 = maps[:, y1, x1]
    return v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy) + v10 * (1 - fx) * fy + v11 * fx * fy


@KEYPOINT_CODECS.register_module()
class SPR(BaseKeypointCodec):

    field_mapping_table = dict(
        heatmaps="heatmaps",
        heatmap_weights="heatmap_weights",
        displacements="displacements",
        displacement_weights="displacement_weights",
    )

    def __init__(
        self,
        input_size: Tuple[int, int],
        heatmap_size: Tuple[int, int],
        sigma: Optional[Union[float, Tuple[float, ...]]] = None,
        generate_keypoint_heatmaps: bool = False,
        root_type: str = "kpt_center",
        minimal_diagonal_length: Union[int, float] = 5,
        background_weight: float = 0.1,
        decode_nms_kernel: int = 5,
        decode_max_instances: int = 30,
        decode_thr: float = 0.01,
    ):
        super().__init__()
        self.input_size = input_size
        self.heatmap_size = heatmap_size
        self.generate_keypoint_heatmaps = generate_keypoint_heatmaps
        self.root_type = root_type
        self.minimal_diagonal_length = minimal_diagonal_length
        self.background_weight = background_weight
        self.decode_nms_kernel = decode_nms_kernel
        self.decode_max_instances = decode_max_instances
        self.decode_thr = decode_thr
        self.scale_factor = (np.array(input_size) / heatmap_size).astype(np.float32)

        if sigma is None:
            sigma = (heatmap_size[0] * heatmap_size[1]) ** 0.5 / 32
            self.sigma = (sigma, sigma // 2) if generate_keypoint_heatmaps else (sigma,)
        else:
            if not isinstance(sigma, (tuple, list)):
                sigma = (sigma,)
            if generate_keypoint_heatmaps:
                assert len(sigma) == 2
            self.sigma = tuple(sigma)

    def _get_heatmap_weights(self, heatmaps, fg_weight: float = 1, bg_weight: float = 0):
        weights = np.full(heatmaps.shape, bg_weight, dtype=np.float32)
        weights[heatmaps > 0] = fg_weight
        return weights

    def encode(self, keypoints: np.ndarray, keypoints_visible: Optional[np.ndarray] = None) -> dict:
        if keypoints_visible is None:
            keypoints_visible = np.ones(keypoints.shape[:2], dtype=np.float32)
        _keypoints = keypoints / self.scale_factor
        roots, roots_visible = get_instance_root(_keypoints, keypoints_visible, self.root_type)
        diagonal_lengths = get_diagonal_lengths(_keypoints, keypoints_visible)
        roots_visible[diagonal_lengths < self.minimal_diagonal_length] = 0

        heatmaps, _ = generate_gaussian_heatmaps(
            heatmap_size=self.heatmap_size,
            keypoints=roots[:, None],
            keypoints_visible=roots_visible[:, None],
            sigma=self.sigma[0],
        )
        heatmap_weights = self._get_heatmap_weights(heatmaps, bg_weight=self.background_weight)

        if self.generate_keypoint_heatmaps:
            keypoint_heatmaps, _ = generate_gaussian_heatmaps(
                heatmap_size=self.heatmap_size,
                keypoints=_keypoints,
                keypoints_visible=keypoints_visible,
                sigma=self.sigma[1],
            )
            kpt_weights = self._get_heatmap_weights(keypoint_heatmaps, bg_weight=self.background_weight)
            heatmaps = np.concatenate((keypoint_heatmaps, heatmaps), axis=0)
            heatmap_weights = np.concatenate((kpt_weights, heatmap_weights), axis=0)

        displacements, displacement_weights = generate_displacement_heatmap(
            self.heatmap_size, _keypoints, keypoints_visible, roots, roots_visible,
            diagonal_lengths, self.sigma[0],
        )
        return dict(
            heatmaps=heatmaps,
            heatmap_weights=heatmap_weights,
            displacements=displacements,
            displacement_weights=displacement_weights,
        )

    def decode(self, heatmaps: np.ndarray, displacements: np.ndarray):
        """(K[+1], H, W) heatmaps + (K*2, H, W) displacements -> poses."""
        import jax.numpy as jnp

        from probpose_code_tpu.ops.heatmap import batch_heatmap_nms

        heatmaps = np.asarray(heatmaps)
        displacements = np.asarray(displacements)
        _k, h, w = displacements.shape
        k = _k // 2
        disp = displacements.reshape(k, 2, h, w)
        ys, xs = np.mgrid[0:h, 0:w]
        grid = np.stack([xs, ys], axis=0).astype(np.float32)
        posemaps = (grid[None] + disp).reshape(k, 2, h * w)

        root_peaks = np.asarray(
            batch_heatmap_nms(jnp.asarray(heatmaps[None, -1:]), self.decode_nms_kernel)
        ).reshape(-1)
        order = np.argsort(-root_peaks)[: self.decode_max_instances]
        root_scores = root_peaks[order]
        mask = root_scores > self.decode_thr
        root_scores, pos_idx = root_scores[mask], order[mask]

        keypoints = np.transpose(posemaps[:, :, pos_idx], (2, 0, 1)).astype(np.float32)  # (N, K, 2)

        keypoint_scores = None
        if self.generate_keypoint_heatmaps and heatmaps.shape[0] == 1 + k:
            keypoint_scores = self.get_keypoint_scores(heatmaps[:k], keypoints)

        keypoints = keypoints * self.scale_factor
        return keypoints, (root_scores, keypoint_scores)

    def get_keypoint_scores(self, heatmaps: np.ndarray, keypoints: np.ndarray) -> np.ndarray:
        k = heatmaps.shape[0]
        N = keypoints.shape[0]
        scores = np.zeros((N, k), dtype=np.float32)
        for kk in range(k):
            scores[:, kk] = _bilinear_sample(heatmaps[kk:kk + 1], keypoints[:, kk, 0], keypoints[:, kk, 1])[0]
        return scores
