"""Classification-style losses (JAX).

Parity targets in reference ``mmpose/models/losses/classification_loss.py``:
BCELoss:12, JSDiscretLoss:70, KLDiscretLoss:137, InfoNCELoss:~250,
VariFocalLoss (tail of file).

Note the reference's ``use_sigmoid`` flag semantics: when True the *input is
already a probability* (plain binary_cross_entropy); when False the input is
a logit (bce_with_logits). Kept verbatim.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from probpose_code_tpu.registry import MODELS

_EPS = 1e-12


def _binary_cross_entropy(p, target):
    p = jnp.clip(p, _EPS, 1.0 - _EPS)
    return -(target * jnp.log(p) + (1 - target) * jnp.log(1 - p))


def _bce_with_logits(logits, target):
    # numerically-stable log-sigmoid formulation
    return jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))


@MODELS.register_module()
class BCELoss:
    """Binary cross entropy with optional per-label weighting."""

    def __init__(
        self,
        use_target_weight: bool = False,
        loss_weight: float = 1.0,
        reduction: str = "mean",
        use_sigmoid: bool = False,
    ):
        assert reduction in ("mean", "sum", "none")
        self.use_target_weight = use_target_weight
        self.loss_weight = loss_weight
        self.reduction = reduction
        self.use_sigmoid = use_sigmoid

    def __call__(self, output, target, target_weight=None):
        crit = _binary_cross_entropy if self.use_sigmoid else _bce_with_logits
        loss = crit(output, target)
        if self.use_target_weight:
            assert target_weight is not None
            if target_weight.ndim == 1:
                target_weight = target_weight[:, None]
            loss = loss * target_weight
        if self.reduction == "sum":
            loss = loss.sum()
        elif self.reduction == "mean":
            loss = loss.mean()
        return loss * self.loss_weight


@MODELS.register_module()
class KLDiscretLoss:
    """Discrete KL divergence over SimCC vectors (reference :137)."""

    def __init__(
        self,
        beta: float = 1.0,
        label_softmax: bool = False,
        label_beta: float = 10.0,
        use_target_weight: bool = True,
        mask=None,
        mask_weight: float = 1.0,
    ):
        self.beta = beta
        self.label_softmax = label_softmax
        self.label_beta = label_beta
        self.use_target_weight = use_target_weight
        self.mask = mask
        self.mask_weight = mask_weight

    def _criterion(self, dec_outs, labels):
        log_pt = jax.nn.log_softmax(dec_outs * self.beta, axis=1)
        if self.label_softmax:
            labels = jax.nn.softmax(labels * self.label_beta, axis=1)
        # KLDivLoss(reduction='none') == labels * (log(labels) - log_pt)
        kl = labels * (jnp.log(jnp.clip(labels, _EPS)) - log_pt)
        return kl.mean(axis=1)

    def __call__(self, pred_simcc, gt_simcc, target_weight):
        N, K, _ = pred_simcc[0].shape
        weight = target_weight.reshape(-1) if self.use_target_weight else 1.0

        loss = 0.0
        for pred, target in zip(pred_simcc, gt_simcc):
            pred = pred.reshape(-1, pred.shape[-1])
            target = target.reshape(-1, target.shape[-1])
            t_loss = self._criterion(pred, target) * weight
            if self.mask is not None:
                t_loss = t_loss.reshape(N, K)
                scale = jnp.ones((K,)).at[jnp.asarray(self.mask)].set(self.mask_weight)
                t_loss = t_loss * scale[None]
            loss = loss + t_loss.sum()
        return loss / K


@MODELS.register_module()
class JSDiscretLoss:
    """Jensen-Shannon divergence between heatmap distributions (:70)."""

    def __init__(self, use_target_weight: bool = True, size_average: bool = True):
        self.use_target_weight = use_target_weight
        self.size_average = size_average

    def _kl(self, p, q):
        return p * (jnp.log(jnp.clip(p, 1e-24)) - jnp.log(q + 1e-24))

    def _js(self, pred, gt):
        m = 0.5 * (pred + gt)
        return 0.5 * (self._kl(pred, m) + self._kl(gt, m))

    def __call__(self, pred_hm, gt_hm, target_weight=None):
        if self.use_target_weight:
            assert target_weight is not None
            w = target_weight
            while w.ndim < pred_hm.ndim:
                w = w[..., None]
            loss = self._js(pred_hm * w, gt_hm * w)
        else:
            loss = self._js(pred_hm, gt_hm)
        if self.size_average:
            loss = loss / len(gt_hm)
        return loss.sum()


@MODELS.register_module()
class InfoNCELoss:
    """Contrastive InfoNCE over a batch of features (reference tail)."""

    def __init__(self, temperature: float = 1.0, loss_weight: float = 1.0):
        assert temperature > 0
        self.temp = temperature
        self.loss_weight = loss_weight

    def __call__(self, features: jnp.ndarray) -> jnp.ndarray:
        n = features.shape[0]
        f = features / jnp.linalg.norm(features, axis=1, keepdims=True)
        logits = f @ f.T / self.temp
        log_probs = jax.nn.log_softmax(logits, axis=1)
        loss = -jnp.take_along_axis(log_probs, jnp.arange(n)[:, None], axis=1).sum()
        return loss * self.loss_weight


@MODELS.register_module()
class VariFocalLoss:
    """Varifocal loss (logit inputs) used by RTMO (reference tail)."""

    def __init__(
        self,
        use_target_weight: bool = False,
        loss_weight: float = 1.0,
        reduction: str = "mean",
        alpha: float = 0.75,
        gamma: float = 2.0,
    ):
        assert reduction in ("mean", "sum", "none")
        self.use_target_weight = use_target_weight
        self.loss_weight = loss_weight
        self.reduction = reduction
        self.alpha = alpha
        self.gamma = gamma

    def __call__(self, output, target, target_weight: Optional[jnp.ndarray] = None):
        p = jax.nn.sigmoid(output)
        focal = target * (target > 0) + self.alpha * jnp.power(jnp.abs(p - target), self.gamma) * (target <= 0)
        loss = _bce_with_logits(output, target) * focal
        if self.use_target_weight and target_weight is not None:
            w = target_weight
            while w.ndim < loss.ndim:
                w = w[..., None]
            loss = loss * w
        if self.reduction == "sum":
            loss = loss.sum()
        elif self.reduction == "mean":
            loss = loss.mean()
        return loss * self.loss_weight
