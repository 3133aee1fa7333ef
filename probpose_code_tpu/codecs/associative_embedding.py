"""Associative Embedding codec (bottom-up grouping by tags).

Parity target: reference ``mmpose/codecs/associative_embedding.py`` (503
LoC): encode produces per-keypoint gaussians + flat keypoint indices for the
tag (push/pull) loss; batch decode runs heatmap NMS, per-keypoint top-k,
greedy Hungarian grouping by tag distance (Munkres -> scipy
linear_sum_assignment here), quarter/DARK-UDP refinement, missing-keypoint
fill-in from the tag field, and rescaling to input space.

Host-side decoding: grouping is data-dependent (dynamic instance counts) and
belongs off-device; the dense NMS/top-k feeding it can run in the jitted
program (ops.heatmap.batch_heatmap_nms).
"""

from __future__ import annotations

from itertools import product
from typing import Any, List, Optional, Tuple

import numpy as np
from scipy.optimize import linear_sum_assignment

from probpose_code_tpu.registry import KEYPOINT_CODECS

from .base import BaseKeypointCodec
from .utils import (
    generate_gaussian_heatmaps,
    generate_udp_gaussian_heatmaps,
    refine_keypoints,
    refine_keypoints_dark_udp,
)


def _assign(scores: np.ndarray) -> np.ndarray:
    rows, cols = linear_sum_assignment(scores)
    return np.stack([rows, cols], axis=1).astype(int)


def _group_keypoints_by_tags(
    vals: np.ndarray,
    tags: np.ndarray,
    locs: np.ndarray,
    keypoint_order: List[int],
    val_thr: float,
    tag_thr: float = 1.0,
    max_groups: Optional[int] = None,
) -> np.ndarray:
    """Greedy grouping of keypoint candidates by embedding-tag distance."""
    tag_k, loc_k, val_k = tags, locs, vals
    K, M, D = locs.shape
    assert vals.shape == tags.shape[:2] == (K, M)
    assert len(keypoint_order) == K

    default_ = np.zeros((K, 3 + tag_k.shape[2]), dtype=np.float32)
    joint_dict: dict = {}
    tag_dict: dict = {}

    for i in range(K):
        idx = keypoint_order[i]
        tags_i = tag_k[idx]
        joints = np.concatenate((loc_k[idx], val_k[idx, :, None], tags_i), axis=1)
        mask = joints[:, 2] > val_thr
        tags_i = tags_i[mask]
        joints = joints[mask]
        if joints.shape[0] == 0:
            continue

        if i == 0 or len(joint_dict) == 0:
            for tag, joint in zip(tags_i, joints):
                key = tag[0]
                joint_dict.setdefault(key, np.copy(default_))[idx] = joint
                tag_dict[key] = [tag]
        else:
            grouped_keys = list(joint_dict.keys())
            grouped_tags = [np.mean(tag_dict[k], axis=0) for k in grouped_keys]
            diff = joints[:, None, 3:] - np.array(grouped_tags)[None, :, :]
            diff_normed = np.linalg.norm(diff, ord=2, axis=2)
            diff_saved = np.copy(diff_normed)
            # quantize tag distance to dominate; break ties by response value
            diff_normed = np.round(diff_normed) * 100 - joints[:, 2:3]
            num_added, num_grouped = diff.shape[0], diff.shape[1]
            if num_added > num_grouped:
                diff_normed = np.concatenate(
                    (diff_normed, np.full((num_added, num_added - num_grouped), 1e10, dtype=np.float32)), axis=1
                )
            pairs = _assign(diff_normed)
            for row, col in pairs:
                if row < num_added and col < num_grouped and diff_saved[row][col] < tag_thr:
                    key = grouped_keys[col]
                    joint_dict[key][idx] = joints[row]
                    tag_dict[key].append(tags_i[row])
                else:
                    key = tags_i[row][0]
                    joint_dict.setdefault(key, np.copy(default_))[idx] = joints[row]
                    tag_dict[key] = [tags_i[row]]

    keys = list(joint_dict.keys())[:max_groups]
    if keys:
        results = np.array([joint_dict[k] for k in keys]).astype(np.float32)
        return results[..., : D + 1]
    return np.empty((0, K, D + 1), dtype=np.float32)


@KEYPOINT_CODECS.register_module()
class AssociativeEmbedding(BaseKeypointCodec):

    support_batch_decoding = True
    label_mapping_table = dict(
        keypoint_indices="keypoint_indices",
        keypoint_weights="keypoint_weights",
    )
    field_mapping_table = dict(heatmaps="heatmaps")

    def __init__(
        self,
        input_size: Tuple[int, int],
        heatmap_size: Tuple[int, int],
        sigma: Optional[float] = None,
        use_udp: bool = False,
        decode_keypoint_order: List[int] = [],
        decode_nms_kernel: int = 5,
        decode_gaussian_kernel: int = 3,
        decode_keypoint_thr: float = 0.1,
        decode_tag_thr: float = 1.0,
        decode_topk: int = 30,
        decode_center_shift: float = 0.0,
        decode_max_instances: Optional[int] = None,
    ) -> None:
        super().__init__()
        self.input_size = input_size
        self.heatmap_size = heatmap_size
        self.use_udp = use_udp
        self.decode_nms_kernel = decode_nms_kernel
        self.decode_gaussian_kernel = decode_gaussian_kernel
        self.decode_keypoint_thr = decode_keypoint_thr
        self.decode_tag_thr = decode_tag_thr
        self.decode_topk = decode_topk
        self.decode_center_shift = decode_center_shift
        self.decode_max_instances = decode_max_instances
        self.decode_keypoint_order = list(decode_keypoint_order)
        if use_udp:
            self.scale_factor = ((np.array(input_size) - 1) / (np.array(heatmap_size) - 1)).astype(np.float32)
        else:
            self.scale_factor = (np.array(input_size) / heatmap_size).astype(np.float32)
        if sigma is None:
            sigma = (heatmap_size[0] * heatmap_size[1]) ** 0.5 / 64
        self.sigma = sigma

    # -- encode -----------------------------------------------------------

    def encode(self, keypoints: np.ndarray, keypoints_visible: Optional[np.ndarray] = None) -> dict:
        if keypoints_visible is None:
            keypoints_visible = np.ones(keypoints.shape[:2], dtype=np.float32)
        _keypoints = keypoints / self.scale_factor
        gen = generate_udp_gaussian_heatmaps if self.use_udp else generate_gaussian_heatmaps
        heatmaps, keypoint_weights = gen(
            heatmap_size=self.heatmap_size,
            keypoints=_keypoints,
            keypoints_visible=keypoints_visible,
            sigma=self.sigma,
        )
        keypoint_indices = self._encode_keypoint_indices(self.heatmap_size, _keypoints, keypoints_visible)
        return dict(heatmaps=heatmaps, keypoint_indices=keypoint_indices, keypoint_weights=keypoint_weights)

    def _encode_keypoint_indices(self, heatmap_size, keypoints, keypoints_visible) -> np.ndarray:
        w, h = heatmap_size
        N, K, _ = keypoints.shape
        keypoint_indices = np.zeros((N, K, 2), dtype=np.int64)
        for n, k in product(range(N), range(K)):
            x, y = (keypoints[n, k] + 0.5).astype(np.int64)
            index = y * w + x
            vis = keypoints_visible[n, k] > 0.5 and 0 <= x < w and 0 <= y < h
            keypoint_indices[n, k] = [index, vis]
        return keypoint_indices

    def decode(self, encoded: Any) -> Tuple[np.ndarray, np.ndarray]:
        raise NotImplementedError("use batch_decode for AssociativeEmbedding")

    # -- decode -----------------------------------------------------------

    def _get_batch_topk(self, batch_heatmaps: np.ndarray, batch_tags: np.ndarray, k: int):
        B, K, H, W = batch_heatmaps.shape
        L = batch_tags.shape[1] // K
        flat = batch_heatmaps.reshape(B, K, H * W)
        topk_indices = np.argsort(-flat, axis=-1)[..., :k]
        topk_vals = np.take_along_axis(flat, topk_indices, axis=-1)
        tags = batch_tags.reshape(B, L, K, H * W)
        topk_tags = np.stack(
            [np.take_along_axis(tags[:, l], topk_indices, axis=-1) for l in range(L)], axis=-1
        )  # (B, K, k, L)
        topk_locs = np.stack([topk_indices % W, topk_indices // W], axis=-1).astype(np.float32)
        return topk_vals, topk_tags, topk_locs

    def _fill_missing_keypoints(self, keypoints, keypoint_scores, heatmaps, tags):
        N, K = keypoints.shape[:2]
        H, W = heatmaps.shape[1:]
        L = tags.shape[0] // K
        keypoint_tags = [tags[k::K] for k in range(K)]
        for n in range(N):
            _tag = []
            for k in range(K):
                if keypoint_scores[n, k] > 0:
                    x, y = keypoints[n, k, :2].astype(np.int64)
                    x = np.clip(x, 0, W - 1)
                    y = np.clip(y, 0, H - 1)
                    _tag.append(keypoint_tags[k][:, y, x])
            if not _tag:
                continue
            tag = np.mean(_tag, axis=0).reshape(L, 1, 1)
            for k in range(K):
                if keypoint_scores[n, k] > 0:
                    continue
                dist_map = np.linalg.norm(keypoint_tags[k] - tag, ord=2, axis=0)
                cost_map = np.round(dist_map) * 100 - heatmaps[k]
                y, x = np.unravel_index(np.argmin(cost_map), shape=(H, W))
                keypoints[n, k] = [x, y]
                keypoint_scores[n, k] = heatmaps[k, y, x]
        return keypoints, keypoint_scores

    def batch_decode(self, batch_heatmaps, batch_tags):
        """(B, K, H, W) heatmaps + (B, L*K, H, W) tags -> per-image keypoint
        groups in input space."""
        import jax.numpy as jnp

        from probpose_code_tpu.ops.heatmap import batch_heatmap_nms

        batch_heatmaps = np.asarray(batch_heatmaps)
        batch_tags = np.asarray(batch_tags)
        B, K, H, W = batch_heatmaps.shape
        assert batch_tags.shape[0] == B and batch_tags.shape[2:4] == (H, W)

        peaks = np.asarray(batch_heatmap_nms(jnp.asarray(batch_heatmaps), self.decode_nms_kernel))
        topk_vals, topk_tags, topk_locs = self._get_batch_topk(peaks, batch_tags, k=self.decode_topk)

        batch_groups = [
            _group_keypoints_by_tags(
                vals, tags, locs,
                keypoint_order=self.decode_keypoint_order,
                val_thr=self.decode_keypoint_thr,
                tag_thr=self.decode_tag_thr,
                max_groups=self.decode_max_instances,
            )
            for vals, tags, locs in zip(topk_vals, topk_tags, topk_locs)
        ]

        batch_keypoints, batch_keypoint_scores, batch_instance_scores = [], [], []
        for groups, heatmaps, tags in zip(batch_groups, batch_heatmaps, batch_tags):
            keypoints, scores = groups[..., :-1], groups[..., -1]
            instance_scores = scores.mean(axis=-1) if scores.size else np.zeros(0, np.float32)
            if keypoints.size > 0:
                if self.use_udp:
                    keypoints = refine_keypoints_dark_udp(
                        keypoints, heatmaps, blur_kernel_size=self.decode_gaussian_kernel
                    )
                else:
                    keypoints = refine_keypoints(keypoints, heatmaps)
                keypoints += self.decode_center_shift * (scores > 0).astype(keypoints.dtype)[..., None]
                keypoints, scores = self._fill_missing_keypoints(keypoints, scores, heatmaps, tags)
            batch_keypoints.append(keypoints * self.scale_factor)
            batch_keypoint_scores.append(scores)
            batch_instance_scores.append(instance_scores)
        return batch_keypoints, batch_keypoint_scores, batch_instance_scores
