"""DecoupledHeatmap codec (CID — Contextual Instance Decoupling).

Parity target: reference ``mmpose/codecs/decoupled_heatmap.py`` (269 LoC):
coupled (K keypoints + root) gaussians with instance-wise sigmas derived
from the min-overlap radius formula, plus per-instance decoupled heatmaps
keyed by jittered root coordinates; decode = per-instance argmax + quarter
refinement, scores scaled by the instance root confidence.
"""

from __future__ import annotations

import random
from typing import Optional, Tuple

import numpy as np

from probpose_code_tpu.registry import KEYPOINT_CODECS

from .base import BaseKeypointCodec
from .utils import generate_gaussian_heatmaps, get_heatmap_maximum, refine_keypoints
from .utils.instance_property import get_diagonal_lengths, get_instance_bbox, get_instance_root


@KEYPOINT_CODECS.register_module()
class DecoupledHeatmap(BaseKeypointCodec):

    auxiliary_encode_keys = {"bbox"}
    label_mapping_table = dict(
        keypoint_weights="keypoint_weights",
        instance_coords="instance_coords",
    )
    field_mapping_table = dict(
        heatmaps="heatmaps",
        instance_heatmaps="instance_heatmaps",
    )

    def __init__(
        self,
        input_size: Tuple[int, int],
        heatmap_size: Tuple[int, int],
        root_type: str = "kpt_center",
        heatmap_min_overlap: float = 0.7,
        encode_max_instances: int = 30,
    ):
        super().__init__()
        self.input_size = input_size
        self.heatmap_size = heatmap_size
        self.root_type = root_type
        self.encode_max_instances = encode_max_instances
        self.heatmap_min_overlap = heatmap_min_overlap
        self.scale_factor = (np.array(input_size) / heatmap_size).astype(np.float32)

    def _get_instance_wise_sigmas(self, bbox: np.ndarray) -> np.ndarray:
        """CornerNet-style min-overlap gaussian radii / 3 per instance."""
        sigmas = np.zeros((bbox.shape[0],), dtype=np.float32)
        heights = np.sqrt(((bbox[:, 0] - bbox[:, 1]) ** 2).sum(axis=-1))
        widths = np.sqrt(((bbox[:, 0] - bbox[:, 2]) ** 2).sum(axis=-1))
        ov = self.heatmap_min_overlap
        for i in range(bbox.shape[0]):
            h, w = heights[i], widths[i]
            b1 = h + w
            c1 = w * h * (1 - ov) / (1 + ov)
            r1 = (b1 + np.sqrt(b1**2 - 4 * c1)) / 2
            b2 = 2 * (h + w)
            c2 = (1 - ov) * w * h
            r2 = (b2 + np.sqrt(b2**2 - 16 * c2)) / 2
            a3 = 4 * ov
            b3 = -2 * ov * (h + w)
            c3 = (ov - 1) * w * h
            r3 = (b3 + np.sqrt(b3**2 - 4 * a3 * c3)) / 2
            sigmas[i] = min(r1, r2, r3) / 3
        return sigmas

    def encode(
        self,
        keypoints: np.ndarray,
        keypoints_visible: Optional[np.ndarray] = None,
        bbox: Optional[np.ndarray] = None,
    ) -> dict:
        if keypoints_visible is None:
            keypoints_visible = np.ones(keypoints.shape[:2], dtype=np.float32)
        if bbox is None:
            bbox = get_instance_bbox(keypoints, keypoints_visible)
            bbox = np.tile(bbox, 2).reshape(-1, 4, 2)
            bbox[:, 1:3, 0] = bbox[:, 0:2, 0]
        elif np.asarray(bbox).ndim == 2 and np.asarray(bbox).shape[-1] == 4:
            # plain xyxy (a pipeline without bbox_keep_corner) -> 4 corners;
            # the reference contract is (N, 8)/(N, 4, 2) corner boxes
            b = np.asarray(bbox, np.float32)
            bbox = np.stack(
                [b[:, [0, 1]], b[:, [0, 3]], b[:, [2, 1]], b[:, [2, 3]]], axis=1
            )

        _keypoints = keypoints / self.scale_factor
        _bbox = bbox.reshape(-1, 4, 2) / self.scale_factor
        roots, roots_visible = get_instance_root(_keypoints, keypoints_visible, self.root_type)
        sigmas = self._get_instance_wise_sigmas(_bbox)

        heatmaps, keypoint_weights = generate_gaussian_heatmaps(
            heatmap_size=self.heatmap_size,
            keypoints=np.concatenate((_keypoints, roots[:, None]), axis=1),
            keypoints_visible=np.concatenate((keypoints_visible, roots_visible[:, None]), axis=1),
            sigma=sigmas,
        )
        roots_visible = keypoint_weights[:, -1]

        inst_roots, inst_indices = [], []
        diagonal_lengths = get_diagonal_lengths(_keypoints, keypoints_visible)
        for i in np.argsort(diagonal_lengths):
            if roots_visible[i] < 1:
                continue
            x, y = roots[i] + np.random.randint(-1, 2, (2,))
            x = int(max(0, min(x, self.heatmap_size[0] - 1)))
            y = int(max(0, min(y, self.heatmap_size[1] - 1)))
            if (x, y) not in inst_roots:
                inst_roots.append((x, y))
                inst_indices.append(i)
        if len(inst_indices) > self.encode_max_instances:
            sel = random.sample(range(len(inst_indices)), self.encode_max_instances)
            inst_roots = [inst_roots[i] for i in sel]
            inst_indices = [inst_indices[i] for i in sel]

        inst_heatmaps, inst_weights = [], []
        for i in inst_indices:
            hm, w = generate_gaussian_heatmaps(
                heatmap_size=self.heatmap_size,
                keypoints=_keypoints[i:i + 1],
                keypoints_visible=keypoints_visible[i:i + 1],
                sigma=float(sigmas[i]),
            )
            inst_heatmaps.append(hm)
            inst_weights.append(w)

        if inst_indices:
            inst_heatmaps = np.concatenate(inst_heatmaps)
            inst_weights = np.concatenate(inst_weights)
            inst_roots = np.array(inst_roots, dtype=np.int32)
        else:
            inst_heatmaps = np.empty((0, *self.heatmap_size[::-1]))
            inst_weights = np.empty((0,))
            inst_roots = np.empty((0, 2), dtype=np.int32)

        return dict(
            heatmaps=heatmaps,
            instance_heatmaps=inst_heatmaps,
            keypoint_weights=inst_weights,
            instance_coords=inst_roots,
        )

    def decode(self, instance_heatmaps: np.ndarray, instance_scores: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        keypoints, keypoint_scores = [], []
        for i in range(instance_heatmaps.shape[0]):
            heatmaps = instance_heatmaps[i].copy()
            kpts, scores = get_heatmap_maximum(heatmaps)
            keypoints.append(refine_keypoints(kpts[None], heatmaps))
            keypoint_scores.append(scores[None])
        if not keypoints:
            return np.empty((0, 0, 2)), np.empty((0, 0))
        keypoints = np.concatenate(keypoints) * self.scale_factor
        keypoint_scores = np.concatenate(keypoint_scores) * instance_scores
        return keypoints, keypoint_scores
