"""DWPose distillation: teacher->student SimCC distillation.

Behavioral parity targets:
- DWPoseDistiller: reference ``mmpose/models/distillers/dwpose_distiller.py``
  — frozen teacher, student trained with its original loss + feature MSE
  (FeaLoss, ``losses/fea_dis_loss.py``) + SimCC logit KD (KDLoss,
  ``losses/logit_dis_loss.py``); both KD terms annealed by
  ``1 - epoch/max_epochs`` in stage one (:143-155); stage two (``two_dis``)
  trains the student head on frozen teacher features.

TPU-native: the distillation step is a single jitted program — teacher
forward under ``stop_gradient``, student forward, all losses fused.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from probpose_code_tpu.registry import MODELS


@MODELS.register_module()
class FeaLoss:
    """Feature-map MSE distillation (reference ``fea_dis_loss.py:8-58``)."""

    def __init__(self, name: str = "loss_fea", student_channels: int = 0,
                 teacher_channels: int = 0, alpha_fea: float = 0.00007):
        self.alpha_fea = alpha_fea
        self.needs_align = student_channels and teacher_channels and student_channels != teacher_channels
        self.teacher_channels = teacher_channels

    def __call__(self, feat_s: jnp.ndarray, feat_t: jnp.ndarray, align_params=None, align_apply=None):
        if self.needs_align and align_apply is not None:
            feat_s = align_apply(feat_s)
        n = feat_t.shape[0]
        return jnp.sum((feat_s - jax.lax.stop_gradient(feat_t)) ** 2) / n * self.alpha_fea


@MODELS.register_module()
class KDLoss:
    """SimCC-logit KL distillation (reference ``logit_dis_loss.py:10-75``)."""

    def __init__(self, name: str = "loss_logit", weight: float = 1.0):
        self.weight = weight

    def _one(self, logit_s, logit_t, beta, weight):
        N, K = logit_s.shape[:2]
        s = jax.nn.log_softmax(logit_s * beta, axis=-1)
        t = jax.nn.softmax(jax.lax.stop_gradient(logit_t) * beta, axis=-1)
        kl = (t * (jnp.log(jnp.clip(t, 1e-12, None)) - s)).sum(-1)  # (N, K)
        if weight is not None:
            kl = kl * weight
        return kl.sum(-1).mean() * self.weight

    def __call__(self, pred, pred_t, beta, target_weight=None):
        (sx, sy), (tx, ty) = pred, pred_t
        K = sx.shape[1]
        return (self._one(sx, tx, beta, target_weight) + self._one(sy, ty, beta, target_weight)) / K


@MODELS.register_module()
class DWPoseDistiller:
    """Runtime distiller pairing a frozen teacher PoseModel with a student.

    Use ``loss_fn(student_vars, teacher_vars, batch, epoch, max_epochs)`` as
    the train-step loss; ``predict`` delegates to the student (stage one) or
    to the student head on teacher features (stage two).
    """

    def __init__(self, teacher_cfg, student_cfg, two_dis: bool = False,
                 distill_cfg: Optional[list] = None, teacher_pretrained: Optional[str] = None,
                 metainfo: Optional[dict] = None):
        from probpose_code_tpu.config import Config
        from probpose_code_tpu.models.builder import PoseModel

        def _load(cfg):
            if isinstance(cfg, str):
                cfg = Config.fromfile(cfg)["model"]
            return PoseModel(dict(cfg), metainfo=metainfo)

        self.teacher = _load(teacher_cfg)
        self.student = _load(student_cfg)
        self.two_dis = two_dis
        self.teacher_pretrained = teacher_pretrained
        self.distill_losses: Dict[str, Any] = {}
        for item in distill_cfg or []:
            for m in item.get("methods", []):
                cfg = dict(m)
                name = cfg.pop("name", cfg.get("type"))
                self.distill_losses[name] = MODELS.build(cfg)

    def init(self, input_shape=None, seed: int = 0):
        self.teacher.init(input_shape, seed)
        self.student.init(input_shape, seed + 1)
        if self.teacher_pretrained:
            from probpose_code_tpu.apis.inference import load_weights

            load_weights(self.teacher, self.teacher_pretrained)
        return self.student.variables

    def loss_fn(self, student_vars, batch, epoch: int = 0, max_epochs: int = 1, rngs=None):
        """Stage-one distillation loss. Returns (total, (losses, new_state))."""
        teacher_vars = self.teacher.variables
        x = self.student.preprocess(batch["inputs"])

        # frozen teacher: features + SimCC logits
        def t_fn(module, x):
            feats = module.extract_feat(x, train=False)
            out = module.head(feats, train=False)
            return feats, out

        (fea_t, out_t) = self.teacher.module.apply(teacher_vars, x, method=t_fn)
        fea_t = jax.lax.stop_gradient(fea_t)
        out_t = jax.lax.stop_gradient(out_t)

        def s_fn(module, x):
            feats = module.extract_feat(x, train=True)
            out = module.head(feats, train=True)
            return feats, out

        variables = student_vars
        (fea_s, out_s), new_state = self.student.module.apply(
            variables, x, method=s_fn, rngs=rngs, mutable=["batch_stats"]
        )

        losses: Dict[str, jnp.ndarray] = {}
        # original student loss (SimCC KLDiscret against GT labels)
        from probpose_code_tpu.models.pose_estimators.topdown import simcc_head_loss

        losses.update(simcc_head_loss(out_s, batch, self.student.loss_modules["keypoint"]))

        anneal = 1.0 if self.two_dis else (1.0 - epoch / max(max_epochs, 1))
        if "loss_fea" in self.distill_losses:
            losses["loss_fea"] = anneal * self.distill_losses["loss_fea"](
                fea_s[-1] if isinstance(fea_s, (tuple, list)) else fea_s,
                fea_t[-1] if isinstance(fea_t, (tuple, list)) else fea_t,
            )
        if "loss_logit" in self.distill_losses:
            beta = getattr(self.student.loss_modules["keypoint"], "beta", 1.0)
            losses["loss_logit"] = anneal * self.distill_losses["loss_logit"](
                out_s, out_t, beta, batch.get("keypoint_weights")
            )
        total = sum(v for k, v in losses.items() if k.startswith("loss"))
        return total, (losses, new_state)

    def make_predict(self, **kwargs):
        return self.student.make_predict(**kwargs)
