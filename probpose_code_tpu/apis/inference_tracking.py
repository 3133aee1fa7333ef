"""Simple frame-to-frame pose tracking.

Parity target: reference ``mmpose/apis/inference_tracking.py``
(_track_by_iou:39, _track_by_oks:65, _compute_iou): greedy best-match of the
current instance against the previous frame's results, assigning a new track
id when the best overlap falls below the threshold.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from probpose_code_tpu.evaluation.functional.nms import oks_iou


def _compute_iou(bbox_a: np.ndarray, bbox_b: np.ndarray) -> float:
    x1 = max(bbox_a[0], bbox_b[0])
    y1 = max(bbox_a[1], bbox_b[1])
    x2 = min(bbox_a[2], bbox_b[2])
    y2 = min(bbox_a[3], bbox_b[3])
    inter = max(0, x2 - x1) * max(0, y2 - y1)
    area_a = (bbox_a[2] - bbox_a[0]) * (bbox_a[3] - bbox_a[1])
    area_b = (bbox_b[2] - bbox_b[0]) * (bbox_b[3] - bbox_b[1])
    union = area_a + area_b - inter
    return inter / union if union > 0 else 0.0


def _track_by_iou(res, results_last: List, thr: float) -> Tuple[int, List, float]:
    """Match ``res`` (with .bboxes) to the last frame's results by bbox IoU.

    Returns (track_id, results_last_without_match, best_iou).
    """
    bbox = np.asarray(res.bboxes).reshape(-1)[:4]
    max_iou_score = -1.0
    max_index = -1
    for index, res_last in enumerate(results_last):
        bbox_last = np.asarray(res_last.bboxes).reshape(-1)[:4]
        iou_score = _compute_iou(bbox, bbox_last)
        if iou_score > max_iou_score:
            max_iou_score = iou_score
            max_index = index

    if max_iou_score > thr:
        track_id = results_last[max_index].track_id
        del results_last[max_index]
    else:
        track_id = -1
    return track_id, results_last, max_iou_score


def _track_by_oks(res, results_last: List, thr: float, sigmas=None) -> Tuple[int, List, float]:
    """Match by OKS between keypoint sets."""
    kpts = np.concatenate(
        [np.asarray(res.keypoints).reshape(-1, 2), np.asarray(res.keypoint_scores).reshape(-1, 1)], axis=1
    ).flatten()
    area = float(np.asarray(res.area)) if hasattr(res, "area") else _kpt_area(kpts)
    max_index, max_oks = -1, -1.0
    for index, res_last in enumerate(results_last):
        kpts_last = np.concatenate(
            [np.asarray(res_last.keypoints).reshape(-1, 2), np.asarray(res_last.keypoint_scores).reshape(-1, 1)],
            axis=1,
        ).flatten()
        area_last = float(np.asarray(res_last.area)) if hasattr(res_last, "area") else _kpt_area(kpts_last)
        oks = oks_iou(kpts, kpts_last[None], area, np.array([area_last]), sigmas=sigmas)[0]
        if oks > max_oks:
            max_oks = oks
            max_index = index
    if max_oks > thr:
        track_id = results_last[max_index].track_id
        del results_last[max_index]
    else:
        track_id = -1
    return track_id, results_last, max_oks


def _kpt_area(kpts_flat: np.ndarray) -> float:
    kpts = kpts_flat.reshape(-1, 3)
    w = kpts[:, 0].max() - kpts[:, 0].min()
    h = kpts[:, 1].max() - kpts[:, 1].min()
    return float(w * h)
