"""3D keypoint metrics: MPJPE / P-MPJPE / N-MPJPE (+ SimpleMPJPE).

Parity targets:
- MPJPE: reference ``mmpose/evaluation/metrics/keypoint_3d_metrics.py:15-131``
  ('mpjpe' / 'p-mpjpe' (Procrustes-aligned) / 'n-mpjpe' (scale-aligned) modes,
  per-action breakdown parsed from ``target_img_path``, ``skip_list``).
- SimpleMPJPE: reference
  ``mmpose/evaluation/metrics/simple_keypoint_3d_metrics.py:12-131`` — same
  alignment modes without the action categorization.
"""

from __future__ import annotations

import os.path as osp
from collections import defaultdict
from typing import Dict, List, Optional, Sequence

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


def _aligned_error(pred: np.ndarray, gt: np.ndarray, mask: np.ndarray, align: str) -> float:
    if align == "procrustes":
        pred = _procrustes_align(pred, gt)
    elif align == "scale":
        scale = (pred * gt).sum(axis=(1, 2), keepdims=True) / np.maximum(
            (pred * pred).sum(axis=(1, 2), keepdims=True), 1e-8
        )
        pred = pred * scale
    err = np.linalg.norm(pred - gt, axis=-1)
    return float(err[mask].mean()) if mask.any() else 0.0


@METRICS.register_module()
class SimpleMPJPE(BaseMetric):
    """MPJPE without per-action breakdown (reference
    ``simple_keypoint_3d_metrics.py:12``)."""

    default_prefix = "mpjpe"
    ALIGNMENT = {"mpjpe": "none", "p-mpjpe": "procrustes", "n-mpjpe": "scale"}

    def __init__(self, mode: str = "mpjpe", collect_device: str = "cpu", prefix=None,
                 skip_list: Optional[List[str]] = None):
        super().__init__(collect_device=collect_device, prefix=prefix)
        if mode not in self.ALIGNMENT:
            raise KeyError(f"`mode` should be 'mpjpe', 'p-mpjpe', or 'n-mpjpe', but got '{mode}'.")
        self.mode = mode
        self.skip_list = list(skip_list or [])

    @staticmethod
    def _unpack(raw):
        s = _sample_view(raw)
        pred = np.asarray(s["pred_instances"]["keypoints"])
        if pred.ndim == 4:
            pred = np.squeeze(pred, axis=0)
        if pred.ndim == 2:
            pred = pred[None]
        gt_inst = s["gt_instances"]
        gt = np.asarray(gt_inst.get("lifting_target", gt_inst.get("keypoints")))
        if gt.ndim == 2:
            gt = gt[None]
        mask = np.asarray(
            gt_inst.get("lifting_target_visible", np.ones(gt.shape[:-1]))
        ).astype(bool).reshape(gt.shape[0], -1)
        return s, pred, gt, mask

    def process(self, data_batch, data_samples: Sequence) -> None:
        for raw in data_samples:
            _, pred, gt, mask = self._unpack(raw)
            self.results.append(dict(pred=pred, gt=gt, mask=mask))

    def compute_metrics(self, results: list) -> Dict[str, float]:
        pred = np.concatenate([r["pred"] for r in results])
        gt = np.concatenate([r["gt"] for r in results])
        mask = np.concatenate([r["mask"] for r in results])
        return {self.mode.upper(): _aligned_error(pred, gt, mask, self.ALIGNMENT[self.mode])}


@METRICS.register_module()
class MPJPE(SimpleMPJPE):
    """MPJPE with a per-action-category breakdown parsed from the H36M-style
    ``target_img_path`` basename (``S1_Directions_1.54138969_000001.jpg`` ->
    action category ``Directions``); samples whose ``<subject>_<action>``
    stem is in ``skip_list`` are dropped. Reference
    ``keypoint_3d_metrics.py:15-131``.
    """

    def process(self, data_batch, data_samples: Sequence) -> None:
        for raw in data_samples:
            s, pred, gt, mask = self._unpack(raw)
            img_path = s.get("target_img_path") or s.get("target_img_paths")
            action = ""
            if img_path:
                if isinstance(img_path, (list, tuple, np.ndarray)):
                    img_path = img_path[0]
                base = osp.basename(str(img_path))
                if "_" in base and "." in base:
                    _, rest = base.split("_", 1)
                    action = rest.split(".", 1)[0]
                if base.split(".")[0] in self.skip_list:
                    continue
            actions = np.array([action] * gt.shape[0])
            self.results.append(dict(pred=pred, gt=gt, mask=mask, actions=actions))

    def compute_metrics(self, results: list) -> Dict[str, float]:
        pred = np.concatenate([r["pred"] for r in results])
        gt = np.concatenate([r["gt"] for r in results])
        mask = np.concatenate([r["mask"] for r in results])
        align = self.ALIGNMENT[self.mode]
        name = self.mode.upper()

        metrics = {name: _aligned_error(pred, gt, mask, align)}

        action_category_indices: Dict[str, list] = defaultdict(list)
        actions = np.concatenate([r.get("actions", np.array([""] * len(r["pred"]))) for r in results])
        for idx, action in enumerate(actions):
            if action:
                action_category_indices[str(action).split("_")[0]].append(idx)
        for category, indices in action_category_indices.items():
            metrics[f"{name}_{category}"] = _aligned_error(
                pred[indices], gt[indices], mask[indices], align)
        return metrics
