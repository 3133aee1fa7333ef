"""Keypoint accuracy metrics (host NumPy).

Parity targets in reference ``mmpose/evaluation/functional/keypoint_eval.py``:
keypoint_pck_accuracy, keypoint_auc, keypoint_nme, keypoint_epe,
pose_pck_accuracy:185, simcc_pck_accuracy, multilabel_classification_accuracy.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from probpose_code_tpu.codecs.utils import (
    get_heatmap_expected_value,
    get_heatmap_maximum,
    get_simcc_maximum,
)


def _calc_distances(preds, gts, mask, norm_factor) -> np.ndarray:
    """(N, K) normalized distances transposed to (K, N); -1 where masked."""
    N, K, _ = preds.shape
    _mask = mask.copy()
    _mask[np.where((norm_factor == 0).sum(1))[0], :] = False
    distances = np.full((N, K), -1, dtype=np.float32)
    norm_factor = norm_factor.astype(np.float64).copy()
    norm_factor[np.where(norm_factor <= 0)] = 1e6
    distances[_mask] = np.linalg.norm(((preds - gts) / norm_factor[:, None, :])[_mask], axis=-1)
    return distances.T


def _distance_acc(distances: np.ndarray, thr: float = 0.5) -> float:
    valid = distances != -1
    n = valid.sum()
    if n > 0:
        return (distances[valid] < thr).sum() / n
    return -1


def keypoint_pck_accuracy(pred, gt, mask, thr, norm_factor) -> Tuple[np.ndarray, float, int]:
    distances = _calc_distances(pred, gt, mask, norm_factor)
    acc = np.array([_distance_acc(d, thr) for d in distances])
    valid_acc = acc[acc >= 0]
    cnt = len(valid_acc)
    avg_acc = valid_acc.mean() if cnt > 0 else 0.0
    return acc, avg_acc, cnt


def keypoint_auc(pred, gt, mask, norm_factor, num_thrs: int = 20) -> float:
    nor = np.tile(np.array([[norm_factor, norm_factor]]), (pred.shape[0], 1))
    avg_accs = []
    for i in range(num_thrs):
        thr = 1.0 * i / num_thrs
        _, avg_acc, _ = keypoint_pck_accuracy(pred, gt, mask, thr, nor)
        avg_accs.append(avg_acc)
    return float(np.mean(avg_accs))


def keypoint_nme(pred, gt, mask, normalize_factor) -> float:
    distances = _calc_distances(pred, gt, mask, normalize_factor)
    distance_valid = distances[distances != -1]
    return distance_valid.sum() / max(len(distance_valid), 1)


def keypoint_epe(pred, gt, mask) -> float:
    distances = _calc_distances(pred, gt, mask, np.ones((pred.shape[0], pred.shape[2]), dtype=np.float32))
    distance_valid = distances[distances != -1]
    return float(distance_valid.sum() / max(len(distance_valid), 1))


def pose_pck_accuracy(output, target, mask, thr: float = 0.05, normalize=None, method: str = "argmax"):
    """PCK from heatmaps (reference :185): decode by argmax or expected
    value, normalize by heatmap_size/10."""
    method = method.lower()
    assert method in ("argmax", "expected")
    N, K, H, W = output.shape
    if K == 0:
        return None, 0, 0
    if normalize is None:
        normalize = np.tile(np.array([[H, W]]), (N, 1)) / 10

    if method == "argmax":
        pred, _ = get_heatmap_maximum(output)
        gt, _ = get_heatmap_maximum(target)
    else:
        pred, _ = get_heatmap_expected_value(output)
        gt, _ = get_heatmap_expected_value(target)
    return keypoint_pck_accuracy(pred, gt, mask, thr, normalize)


def simcc_pck_accuracy(output, target, simcc_split_ratio, mask, thr=0.05, normalize=None):
    """PCK from SimCC vectors."""
    pred_x, pred_y = output
    gt_x, gt_y = target
    N, _, Wx = pred_x.shape
    _, _, Wy = pred_y.shape
    W, H = int(Wx / simcc_split_ratio), int(Wy / simcc_split_ratio)
    if normalize is None:
        normalize = np.tile(np.array([[H, W]]), (N, 1)) / 10

    pred_coords, _ = get_simcc_maximum(pred_x, pred_y)
    pred_coords = pred_coords / simcc_split_ratio
    gt_coords, _ = get_simcc_maximum(gt_x, gt_y)
    gt_coords = gt_coords / simcc_split_ratio
    return keypoint_pck_accuracy(pred_coords, gt_coords, mask, thr, normalize)


def multilabel_classification_accuracy(pred, gt, mask, thr: float = 0.5) -> float:
    """Accuracy where every label of an instance must be correct."""
    valid = (mask > 0).min(axis=1) if mask.ndim == 2 else (mask > 0)
    pred, gt = pred[valid], gt[valid]
    if pred.shape[0] == 0:
        return 0.0
    n_correct = ((pred - thr) * (gt - 0.5) > 0).all(axis=1).sum()
    return float(n_correct / pred.shape[0])
