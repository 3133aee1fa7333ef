"""3D keypoint metrics: MPJPE / P-MPJPE / N-MPJPE.

Parity target: reference ``mmpose/evaluation/metrics/keypoint_3d_metrics.py``
(MPJPE metric with 'mpjpe' / 'p-mpjpe' (Procrustes-aligned) / 'n-mpjpe'
(scale-aligned) modes).
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

from probpose_code_tpu.registry import METRICS

from ..base_metric import BaseMetric
from .coco_metric import _sample_view


def _procrustes_align(pred: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """Similarity-transform-align pred to gt per sample (N, K, 3)."""
    aligned = np.zeros_like(pred)
    for i in range(pred.shape[0]):
        X, Y = gt[i], pred[i]
        muX, muY = X.mean(0), Y.mean(0)
        X0, Y0 = X - muX, Y - muY
        normX = np.sqrt((X0**2).sum())
        normY = np.sqrt((Y0**2).sum())
        X0 /= max(normX, 1e-8)
        Y0 /= max(normY, 1e-8)
        H = X0.T @ Y0
        U, s, Vt = np.linalg.svd(H)
        R = U @ Vt
        if np.linalg.det(R) < 0:
            Vt[-1] *= -1
            s[-1] *= -1
            R = U @ Vt
        scale = s.sum() * normX / max(normY, 1e-8)
        aligned[i] = scale * (Y - muY) @ R.T + muX
    return aligned


@METRICS.register_module()
class MPJPE(BaseMetric):
    default_prefix = "mpjpe"
    ALIGNMENT = {"mpjpe": "none", "p-mpjpe": "procrustes", "n-mpjpe": "scale"}

    def __init__(self, mode: str = "mpjpe", collect_device: str = "cpu", prefix=None):
        super().__init__(collect_device=collect_device, prefix=prefix)
        assert mode in self.ALIGNMENT
        self.mode = mode

    def process(self, data_batch, data_samples: Sequence) -> None:
        for raw in data_samples:
            s = _sample_view(raw)
            pred = np.asarray(s["pred_instances"]["keypoints"])
            if pred.ndim == 2:
                pred = pred[None]
            gt_inst = s["gt_instances"]
            gt = np.asarray(gt_inst.get("lifting_target", gt_inst.get("keypoints")))
            if gt.ndim == 2:
                gt = gt[None]
            mask = np.asarray(
                gt_inst.get("lifting_target_visible", np.ones(gt.shape[:-1]))
            ).astype(bool).reshape(gt.shape[:-1])
            self.results.append(dict(pred=pred, gt=gt, mask=mask))

    def compute_metrics(self, results: list) -> Dict[str, float]:
        pred = np.concatenate([r["pred"] for r in results])
        gt = np.concatenate([r["gt"] for r in results])
        mask = np.concatenate([r["mask"] for r in results])

        align = self.ALIGNMENT[self.mode]
        if align == "procrustes":
            pred = _procrustes_align(pred, gt)
        elif align == "scale":
            scale = (pred * gt).sum(axis=(1, 2), keepdims=True) / np.maximum(
                (pred * pred).sum(axis=(1, 2), keepdims=True), 1e-8
            )
            pred = pred * scale

        err = np.linalg.norm(pred - gt, axis=-1)
        value = err[mask].mean() if mask.any() else 0.0
        return {self.mode.upper(): float(value)}
