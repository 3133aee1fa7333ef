"""Dense heatmap losses (JAX).

Parity targets in reference ``mmpose/models/losses/heatmap_loss.py``:
KeypointMSELoss:13, CombinedTargetMSELoss:125, KeypointOHKMMSELoss:192,
AdaptiveWingLoss:271, FocalHeatmapLoss:351, OKSHeatmapLoss:513,
CalibrationLoss:685.

Losses are lightweight callable classes (stateless, hashable config) whose
``__call__`` is pure jnp — safe to close over inside jitted train steps.
Shapes follow the reference: output/target (B, K, H, W), target_weights
(B, K) or (B, K, H, W), optional mask (B, K|1, H, W).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import lax

from probpose_code_tpu.registry import MODELS


def _expand_mask(target_weights: Optional[jnp.ndarray], target_ndim: int) -> Optional[jnp.ndarray]:
    if target_weights is None:
        return None
    while target_weights.ndim < target_ndim:
        target_weights = target_weights[..., None]
    return target_weights


def _resolve_mask(
    target: jnp.ndarray,
    target_weights: Optional[jnp.ndarray],
    mask: Optional[jnp.ndarray],
    skip_empty_channel: bool,
) -> Optional[jnp.ndarray]:
    """Combine spatial mask, keypoint weights and empty-channel skip."""
    out = mask
    if target_weights is not None:
        w = _expand_mask(target_weights, target.ndim)
        out = w if out is None else out * w
    if skip_empty_channel:
        nonempty = jnp.any(target != 0, axis=(-2, -1), keepdims=True).astype(target.dtype)
        out = nonempty if out is None else out * nonempty
    return out


@MODELS.register_module()
class KeypointMSELoss:
    """MSE over heatmaps with optional per-keypoint weighting."""

    def __init__(
        self,
        use_target_weight: bool = False,
        skip_empty_channel: bool = False,
        loss_weight: float = 1.0,
    ):
        self.use_target_weight = use_target_weight
        self.skip_empty_channel = skip_empty_channel
        self.loss_weight = loss_weight

    def __call__(self, output, target, target_weights=None, mask=None, per_pixel: bool = False):
        if not self.use_target_weight:
            target_weights = None
        _mask = _resolve_mask(target, target_weights, mask, self.skip_empty_channel)
        loss = (output - target) ** 2
        if _mask is not None:
            loss = loss * _mask
        if per_pixel:
            return loss * self.loss_weight
        return loss.mean() * self.loss_weight


@MODELS.register_module()
class CombinedTargetMSELoss:
    """MSE for combined (class + x/y offset) targets; offsets are gated by
    the GT class map (reference heatmap_loss.py:125)."""

    def __init__(self, use_target_weight: bool = False, loss_weight: float = 1.0):
        self.use_target_weight = use_target_weight
        self.loss_weight = loss_weight

    def __call__(self, output, target, target_weights=None):
        B = output.shape[0]
        K3 = output.shape[1]
        K = K3 // 3
        o = output.reshape(B, K, 3, -1)
        t = target.reshape(B, K, 3, -1)
        hm_pred, hm_gt = o[:, :, 0], t[:, :, 0]
        if self.use_target_weight and target_weights is not None:
            w = target_weights[:, :K, None]
            hm_pred = hm_pred * w
            hm_gt = hm_gt * w
        loss = 0.5 * jnp.mean((hm_pred - hm_gt) ** 2)
        for c in (1, 2):
            loss = loss + 0.5 * jnp.mean((hm_gt * o[:, :, c] - hm_gt * t[:, :, c]) ** 2)
        return loss / K * self.loss_weight


@MODELS.register_module()
class KeypointOHKMMSELoss:
    """MSE with online hard keypoint mining: average the top-k worst
    keypoint losses per sample (reference heatmap_loss.py:192)."""

    def __init__(self, use_target_weight: bool = False, topk: int = 8, loss_weight: float = 1.0):
        assert topk > 0
        self.use_target_weight = use_target_weight
        self.topk = topk
        self.loss_weight = loss_weight

    def __call__(self, output, target, target_weights=None):
        per_kpt = jnp.mean((output - target) ** 2, axis=(-2, -1))  # (B, K)
        if self.use_target_weight and target_weights is not None:
            per_kpt = per_kpt * target_weights
        topk_vals, _ = lax.top_k(per_kpt, self.topk)
        return topk_vals.sum(axis=1).mean() / self.topk * self.loss_weight


@MODELS.register_module()
class AdaptiveWingLoss:
    """Adaptive wing loss for heatmap regression (reference :271)."""

    def __init__(
        self,
        alpha: float = 2.1,
        omega: float = 14.0,
        epsilon: float = 1.0,
        theta: float = 0.5,
        use_target_weight: bool = False,
        loss_weight: float = 1.0,
    ):
        self.alpha = alpha
        self.omega = omega
        self.epsilon = epsilon
        self.theta = theta
        self.use_target_weight = use_target_weight
        self.loss_weight = loss_weight

    def __call__(self, output, target, target_weights=None):
        delta = jnp.abs(output - target)
        a_minus_y = self.alpha - target
        A = (
            self.omega
            * (1 / (1 + (self.theta / self.epsilon) ** a_minus_y))
            * a_minus_y
            * ((self.theta / self.epsilon) ** (a_minus_y - 1))
            / self.epsilon
        )
        C = self.theta * A - self.omega * jnp.log1p((self.theta / self.epsilon) ** a_minus_y)
        small = self.omega * jnp.log1p((delta / self.epsilon) ** a_minus_y)
        large = A * delta - C
        loss = jnp.where(delta < self.theta, small, large)
        if self.use_target_weight and target_weights is not None:
            loss = loss * _expand_mask(target_weights, loss.ndim)
        return loss.mean() * self.loss_weight


@MODELS.register_module()
class FocalHeatmapLoss:
    """CornerNet-style focal loss for gaussian heatmaps (reference :351)."""

    def __init__(self, alpha: int = 2, beta: int = 4, use_target_weight: bool = False, loss_weight: float = 1.0):
        self.alpha = alpha
        self.beta = beta
        self.use_target_weight = use_target_weight
        self.loss_weight = loss_weight

    def __call__(self, output, target, target_weights=None, mask=None):
        pos = (target == 1).astype(output.dtype)
        neg = (target < 1).astype(output.dtype)
        if self.use_target_weight and target_weights is not None:
            w = _expand_mask(target_weights, target.ndim)
            pos = pos * w
            neg = neg * w
        if mask is not None:
            pos = pos * mask
            neg = neg * mask
        eps = 1e-12
        neg_weights = jnp.power(1 - target, self.beta)
        pos_loss = jnp.log(output + eps) * jnp.power(1 - output, self.alpha) * pos
        neg_loss = jnp.log(1 - output + eps) * jnp.power(output, self.alpha) * neg_weights * neg
        num_pos = pos.sum()
        loss = jnp.where(num_pos > 0, -(pos_loss.sum() + neg_loss.sum()) / jnp.maximum(num_pos, 1.0), -neg_loss.sum())
        return loss * self.loss_weight


def _sobel_gradients(output: jnp.ndarray) -> jnp.ndarray:
    """Squared Sobel gradient magnitude per pixel, same padding."""
    B, K, H, W = output.shape
    sx = jnp.asarray([[1.0, 0.0, -1.0], [2.0, 0.0, -2.0], [1.0, 0.0, -1.0]]).reshape(1, 1, 3, 3)
    sy = jnp.asarray([[1.0, 2.0, 1.0], [0.0, 0.0, 0.0], [-1.0, -2.0, -1.0]]).reshape(1, 1, 3, 3)
    x = output.reshape(B * K, 1, H, W)
    dn = lax.conv_dimension_numbers(x.shape, sx.shape, ("NCHW", "OIHW", "NCHW"))
    gx = lax.conv_general_dilated(x, sx, (1, 1), "SAME", dimension_numbers=dn)
    gy = lax.conv_general_dilated(x, sy, (1, 1), "SAME", dimension_numbers=dn)
    return (gx**2 + gy**2).reshape(B, K, H, W)


@MODELS.register_module()
class OKSHeatmapLoss:
    """Expected-OKS risk for ProbMap heads (reference heatmap_loss.py:513).

    ``output * (1 - target)`` ("minus"), ``(1 - output) * target`` ("plus"),
    or their mean ("both"), plus a Sobel smoothness term and an optional MSE
    term; per-pixel / per-keypoint / scalar reductions.

    NOTE: torch's F.conv2d cross-correlates, so the reference's "sobel"
    kernels are applied un-flipped; lax convolution matches (no flip).
    """

    def __init__(
        self,
        use_target_weight: bool = False,
        skip_empty_channel: bool = False,
        smoothing_weight: float = 0.2,
        gaussian_weight: float = 0.0,
        loss_weight: float = 1.0,
        oks_type: str = "minus",
    ):
        assert oks_type.lower() in ("minus", "plus", "both")
        self.use_target_weight = use_target_weight
        self.skip_empty_channel = skip_empty_channel
        self.smoothing_weight = smoothing_weight
        self.gaussian_weight = gaussian_weight
        self.loss_weight = loss_weight
        self.oks_type = oks_type.lower()

    def __call__(
        self,
        output,
        target,
        target_weights=None,
        mask=None,
        per_pixel: bool = False,
        per_keypoint: bool = False,
    ):
        B, K, H, W = output.shape
        if not self.use_target_weight:
            target_weights = None
        _mask = _resolve_mask(target, target_weights, mask, self.skip_empty_channel)

        oks_minus = output * (1 - target)
        oks_plus = (1 - output) * target
        if self.oks_type == "both":
            oks = (oks_minus + oks_plus) / 2
        elif self.oks_type == "minus":
            oks = oks_minus
        else:
            oks = oks_plus

        mse = (output - target) ** 2
        gradient = _sobel_gradients(output)

        if _mask is not None:
            oks = oks * _mask
            mse = mse * _mask
            gradient = gradient * _mask

        oks_w = 1 - self.smoothing_weight - self.gaussian_weight
        if per_pixel:
            loss = self.smoothing_weight * gradient + oks_w * oks + self.gaussian_weight * mse
        else:
            max_gradient = gradient.reshape(B, K, H * W).max(axis=-1)
            loss = (
                oks_w * oks.sum(axis=(2, 3))
                + self.smoothing_weight * max_gradient
                + self.gaussian_weight * mse.mean(axis=(2, 3))
            )
            if not per_keypoint:
                loss = loss.mean()
        return loss * self.loss_weight


@MODELS.register_module()
class CalibrationLoss:
    """Calibration regularizer for the probability branch (reference :685).

    Binary cross-entropy between per-pixel predicted probability mass and the
    GT expected-OKS map, restricted to annotated keypoints.
    """

    def __init__(
        self,
        use_target_weight: bool = False,
        skip_empty_channel: bool = False,
        loss_weight: float = 1.0,
        ignore_bottom_percentile: float = 0.7,
    ):
        self.use_target_weight = use_target_weight
        self.skip_empty_channel = skip_empty_channel
        self.loss_weight = loss_weight
        self.ignore_bottom_percentile = ignore_bottom_percentile

    def __call__(self, output, target, target_weights=None, mask=None):
        if not self.use_target_weight:
            target_weights = None
        _mask = _resolve_mask(target, target_weights, mask, self.skip_empty_channel)
        eps = 1e-12
        bce = -(target * jnp.log(output + eps) + (1 - target) * jnp.log(1 - output + eps))
        if _mask is not None:
            bce = bce * _mask
            denom = jnp.maximum(_mask.sum(), 1.0)
            return bce.sum() / denom * self.loss_weight
        return bce.mean() * self.loss_weight


@MODELS.register_module()
class MLECCLoss:
    """Maximum-likelihood loss for coordinate classification (RTMO DCC;
    reference ``heatmap_loss.py:432-510``).

    ``prob = prod_axes sum(output * target, -1)`` over the (x, y) 1-D heatmap
    pairs; loss = 1-prob / 1-prob^2 / -log(prob + 1e-4). NaNs zeroed, then
    per-sample sum/mean over keypoints.
    """

    def __init__(
        self,
        reduction: str = "mean",
        mode: str = "log",
        use_target_weight: bool = False,
        loss_weight: float = 1.0,
    ):
        assert reduction in ("mean", "sum", "none")
        assert mode in ("linear", "square", "log")
        self.reduction = reduction
        self.mode = mode
        self.use_target_weight = use_target_weight
        self.loss_weight = loss_weight

    def __call__(self, outputs, targets, target_weight=None):
        assert len(outputs) == len(targets)
        prob = 1.0
        for o, t in zip(outputs, targets):
            prob = prob * (o * t).sum(axis=-1)
        if self.mode == "linear":
            loss = 1.0 - prob
        elif self.mode == "square":
            loss = 1.0 - prob**2
        else:
            loss = -jnp.log(prob + 1e-4)
        loss = jnp.where(jnp.isnan(loss), 0.0, loss)
        if self.use_target_weight and target_weight is not None:
            w = target_weight
            while w.ndim < loss.ndim:
                w = w[..., None]
            loss = loss * w
        if self.reduction == "sum":
            loss = loss.reshape(loss.shape[0], -1).sum(axis=1)
        elif self.reduction == "mean":
            loss = loss.reshape(loss.shape[0], -1).mean(axis=1)
        return loss * self.loss_weight
