"""Bounding-box IoU loss (reference ``mmpose/models/losses/bbox_loss.py:12-75``)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from probpose_code_tpu.registry import MODELS
from probpose_code_tpu.models.task_modules.assigners import bbox_overlaps


@MODELS.register_module()
class IoULoss:
    """IoU loss between aligned xyxy boxes: linear / square / log scaling."""

    def __init__(self, reduction: str = "mean", mode: str = "log", eps: float = 1e-16, loss_weight: float = 1.0):
        assert reduction in ("mean", "sum", "none")
        assert mode in ("linear", "square", "log")
        self.reduction = reduction
        self.mode = mode
        self.eps = eps
        self.loss_weight = loss_weight

    def __call__(self, output, target, target_weight: Optional[jnp.ndarray] = None):
        ious = jnp.clip(bbox_overlaps(output, target, is_aligned=True), self.eps, None)
        if self.mode == "linear":
            loss = 1 - ious
        elif self.mode == "square":
            loss = 1 - ious**2
        else:
            loss = -jnp.log(ious)
        if target_weight is not None:
            w = target_weight
            while w.ndim < loss.ndim:
                w = w[..., None]
            loss = loss * w
        if self.reduction == "sum":
            loss = loss.sum()
        elif self.reduction == "mean":
            loss = loss.mean()
        return loss * self.loss_weight
