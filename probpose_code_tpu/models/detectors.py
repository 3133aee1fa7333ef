"""RTMDet person detector (detector stage of the top-down pipeline).

Behavioral parity target: the reference drives person detection through
mmdet RTMDet configs (``apis/inferencers/utils/default_det_models.py`` →
``demo/mmdetection_cfg/rtmdet_m_640-8xb32_coco-person.py``). This module
provides the equivalent in-framework detector so ``Pose2DInferencer`` can
run detector → top-down pose without an external dependency:

* CSPNeXt backbone + CSPNeXtPAFPN neck (already in the zoo)
* RTMDetSepBNHead: per-level shared-architecture cls/reg towers with
  separate BN per level, 1x anchor-free point priors, distance-to-edge
  box regression
* training targets via the vectorized in-jit SimOTA (kpt terms disabled)
* predict: dense scores -> static top-k on device, NMS on host
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from probpose_code_tpu.registry import MODELS
from probpose_code_tpu.models.backbones.cspnext import ConvModule
from probpose_code_tpu.models.task_modules import MlvlPointGenerator, simota_assign
from .heads.yoloxpose_head import _bce_logits, _flatten_levels


@MODELS.register_module()
class RTMDetSepBNHead(nn.Module):
    """Separate-BN-per-level RTMDet head (bbox only, 1 class)."""

    num_classes: int = 1
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 2
    featmap_strides: Sequence[int] = (8, 16, 32)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False) -> Dict[str, jnp.ndarray]:
        cls_out, reg_out = [], []
        prior_bias = float(-np.log((1 - 0.01) / 0.01))
        for i, x in enumerate(feats):
            cf, rf = x, x
            for j in range(self.stacked_convs):
                # conv weights could be shared across levels in the reference;
                # separate BN per level is the part that matters numerically
                cf = ConvModule(self.feat_channels, 3, dtype=self.dtype, name=f"cls_conv{i}_{j}")(cf, train=train)
                rf = ConvModule(self.feat_channels, 3, dtype=self.dtype, name=f"reg_conv{i}_{j}")(rf, train=train)
            cls_out.append(nn.Conv(self.num_classes, (1, 1), name=f"rtm_cls{i}",
                                   bias_init=nn.initializers.constant(prior_bias))(cf))
            # distances to l, t, r, b in stride units (softplus keeps them >= 0)
            reg_out.append(jax.nn.softplus(nn.Conv(4, (1, 1), name=f"rtm_reg{i}")(rf)))
        return dict(
            cls_scores=_flatten_levels(cls_out, self.num_classes).astype(jnp.float32),
            bbox_dists=_flatten_levels(reg_out, 4).astype(jnp.float32),
        )


@MODELS.register_module()
class RTMDet(nn.Module):
    """Single-class detector: backbone + neck + sep-BN head."""

    backbone: nn.Module
    head: nn.Module
    neck: Optional[nn.Module] = None

    def __call__(self, inputs: jnp.ndarray, train: bool = False):
        feats = self.backbone(inputs, train=train)
        if self.neck is not None:
            feats = self.neck(feats, train=train)
        out = self.head(feats, train=train)
        featmap_sizes = tuple((f.shape[1], f.shape[2]) for f in feats)
        gen = MlvlPointGenerator(strides=list(self.head.featmap_strides))
        pj = jnp.asarray(gen.flat_priors(featmap_sizes, with_stride=True))
        d = out["bbox_dists"] * pj[None, :, 2:3]
        out["bbox_decoded"] = jnp.concatenate(
            [pj[None, :, :2] - d[..., :2], pj[None, :, :2] + d[..., 2:]], axis=-1
        )
        out["priors"] = pj
        return out


def rtmdet_loss(outputs: Dict[str, jnp.ndarray], batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """SimOTA-assigned detection loss: quality-focal-style BCE + GIoU."""
    from probpose_code_tpu.models.task_modules.assigners import bbox_overlaps

    priors = outputs["priors"]
    scores = jax.nn.sigmoid(jax.lax.stop_gradient(outputs["cls_scores"]))
    N, K = priors.shape[0], 1
    dummy_k = jnp.zeros((N, K, 2))
    dummy_v = jnp.ones((N, K))

    def one(s, b, gb, gl, ga, gval):
        G = gb.shape[0]
        r = simota_assign(
            priors, s, b, dummy_k, dummy_v,
            gb, gl, jnp.zeros((G, K, 2)), jnp.ones((G, K)), ga, gval,
            oks_weight=0.0, dynamic_k_indicator="iou",
        )
        return r.fg_mask, r.matched_gt, r.matched_metric

    fg, mgt, metric = jax.vmap(one)(
        scores, jax.lax.stop_gradient(outputs["bbox_decoded"]),
        batch["gt_bboxes"], batch["gt_labels"], batch["gt_areas"], batch["gt_valid"],
    )
    idx = jnp.clip(mgt, 0, batch["gt_bboxes"].shape[1] - 1)
    tb = jnp.take_along_axis(batch["gt_bboxes"], idx[..., None], 1)
    fgf = fg.astype(jnp.float32)
    num_pos = jnp.clip(fgf.sum(), 1.0, None)

    giou = bbox_overlaps(outputs["bbox_decoded"], tb, mode="giou", is_aligned=True)
    losses = {
        "loss_bbox": ((1 - giou) * fgf).sum() / num_pos * 2.0,
        "loss_cls": (_bce_logits(outputs["cls_scores"][..., 0],
                                 jax.lax.stop_gradient(metric) * fgf)).sum() / num_pos,
    }
    return losses


def rtmdet_device_predict(outputs: Dict[str, jnp.ndarray], *, nms_pre: int = 200) -> Dict[str, jnp.ndarray]:
    scores = jax.nn.sigmoid(outputs["cls_scores"])[..., 0]
    k = min(nms_pre, scores.shape[-1])
    top, idx = jax.lax.top_k(scores, k)
    boxes = jax.vmap(lambda a, i: a[i])(outputs["bbox_decoded"], idx)
    return dict(scores=top, bboxes=boxes)


def detect_people(model_vars, module, images, *, score_thr: float = 0.3, nms_thr: float = 0.65):
    """Host wrapper: images -> per-image person boxes (xyxy) + scores."""
    from probpose_code_tpu.evaluation.functional.nms import bbox_nms_np

    out = module.apply(model_vars, images, train=False)
    dev = rtmdet_device_predict(out)
    results = []
    for b in range(images.shape[0]):
        s = np.asarray(dev["scores"][b])
        bx = np.asarray(dev["bboxes"][b])
        keep = s >= score_thr
        s, bx = s[keep], bx[keep]
        if len(s):
            keep_nms = bbox_nms_np(bx, s, nms_thr)
            s, bx = s[keep_nms], bx[keep_nms]
        results.append(dict(bboxes=bx, scores=s))
    return results
