"""YOLOX-Pose one-stage head.

Behavioral parity with reference
``mmpose/models/heads/hybrid_heads/yoloxpose_head.py`` (head module :21-226,
loss :284-394, target assembly :465-630, predict :632-741, bbox/kpt decode
:743-790). TPU-native redesign:

* all per-level maps are flattened to dense static (B, N, .) tensors in NHWC
  order (reference ``_flatten_predictions`` :792-798);
* point priors are NumPy constants folded into the program;
* SimOTA target assignment (:557) runs fully vectorized inside ``jit``
  (:mod:`probpose_code_tpu.models.task_modules.assigners`) — the reference
  loops images in Python on host-synced tensors;
* losses are masked dense reductions, so the whole train step is one XLA
  program. ``heatmap_mask`` objectness down-weighting (:592-604, CrowdPose)
  is supported via an optional batch field.
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


class ConvTower(nn.Module):
    """Stack of 3x3 ConvModules."""

    feat_channels: int
    depth: int = 2
    groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.depth):
            g = 1 if i == 0 else self.groups
            x = ConvModule(self.feat_channels, 3, groups=g, dtype=self.dtype, name=f"conv{i}")(x, train=train)
        return x


def _flatten_levels(maps: Sequence[jnp.ndarray], last_dim: int) -> jnp.ndarray:
    """[(B, H, W, C)...] -> (B, sum HW, C) preserving level order."""
    return jnp.concatenate([m.reshape(m.shape[0], -1, last_dim) for m in maps], axis=1)


@MODELS.register_module()
class YOLOXPoseHeadModule(nn.Module):
    """Per-level cls/reg/pose towers (reference :21-226), outputs flattened."""

    num_keypoints: int
    in_channels: int
    num_classes: int = 1
    widen_factor: float = 1.0
    feat_channels: int = 256
    stacked_convs: int = 2
    featmap_strides: Sequence[int] = (8, 16, 32)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Tuple[jnp.ndarray, ...], train: bool = False) -> Dict[str, Any]:
        fc = int(self.feat_channels * self.widen_factor)
        cls_s, objs, bboxes, kpts, kvis = [], [], [], [], []
        prior_bias = float(-np.log((1 - 0.01) / 0.01))  # bias_init_with_prob(0.01)
        for i, x in enumerate(feats):
            cf = ConvTower(fc, self.stacked_convs, dtype=self.dtype, name=f"conv_cls{i}")(x, train=train)
            rf = ConvTower(fc, self.stacked_convs, dtype=self.dtype, name=f"conv_reg{i}")(x, train=train)
            pf = ConvTower(fc, self.stacked_convs * 2, dtype=self.dtype, name=f"conv_pose{i}")(x, train=train)
            cls_s.append(nn.Conv(self.num_classes, (1, 1), name=f"out_cls{i}",
                                 bias_init=nn.initializers.constant(prior_bias))(cf))
            objs.append(nn.Conv(1, (1, 1), name=f"out_obj{i}",
                                bias_init=nn.initializers.constant(prior_bias))(rf))
            bboxes.append(nn.Conv(4, (1, 1), name=f"out_bbox{i}")(rf))
            kpts.append(nn.Conv(self.num_keypoints * 2, (1, 1), name=f"out_kpt{i}")(pf))
            kvis.append(nn.Conv(self.num_keypoints, (1, 1), name=f"out_kpt_vis{i}")(pf))
        B = feats[0].shape[0]
        return dict(
            cls_scores=_flatten_levels(cls_s, self.num_classes).astype(jnp.float32),
            objectness=_flatten_levels(objs, 1).astype(jnp.float32),
            bbox_preds=_flatten_levels(bboxes, 4).astype(jnp.float32),
            kpt_offsets=_flatten_levels(kpts, self.num_keypoints * 2).reshape(
                B, -1, self.num_keypoints, 2
            ).astype(jnp.float32),
            kpt_vis=_flatten_levels(kvis, self.num_keypoints).astype(jnp.float32),
        )


def decode_bbox(pred: jnp.ndarray, priors_xy: jnp.ndarray, stride: jnp.ndarray) -> jnp.ndarray:
    """(dx, dy, log w, log h) -> xyxy (reference :743-780)."""
    xys = pred[..., :2] * stride[..., None] + priors_xy
    whs = jnp.exp(pred[..., 2:]) * stride[..., None]
    return jnp.concatenate([xys - whs / 2, xys + whs / 2], axis=-1)


def decode_kpt_reg(pred: jnp.ndarray, priors_xy: jnp.ndarray, stride: jnp.ndarray) -> jnp.ndarray:
    """per-keypoint offsets (in strides) -> absolute xy (reference :782-790)."""
    return pred * stride[..., None, None] + priors_xy[..., None, :]


def _bce_logits(logits, target):
    return jnp.clip(logits, 0, None) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def onestage_assign_batch(
    outputs: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    priors: np.ndarray,
    assigner_cfg: Dict[str, Any],
    oks_sigmas: Optional[np.ndarray],
) -> Dict[str, jnp.ndarray]:
    """vmapped SimOTA over the batch; returns per-prior targets, all dense."""
    priors_j = jnp.asarray(priors)
    cls_p = jax.lax.stop_gradient(outputs["cls_scores"])
    obj_p = jax.lax.stop_gradient(outputs["objectness"])
    bbox_d = jax.lax.stop_gradient(outputs["bbox_decoded"])
    kpt_d = jax.lax.stop_gradient(outputs["kpt_decoded"])
    vis_p = jax.lax.stop_gradient(outputs["kpt_vis"])

    def clipped_sig(x):
        s = jax.nn.sigmoid(jnp.clip(x, -1e4, 1e4))
        return jnp.where(jnp.isnan(s), 0.0, s)

    scores = jnp.sqrt(clipped_sig(cls_p) * clipped_sig(obj_p))
    vis_sig = clipped_sig(vis_p)

    def one(s, b, k, v, gb, gl, gk, gv, ga, gval):
        r = simota_assign(
            priors_j, s, b, k, v, gb, gl, gk, gv, ga, gval,
            center_radius=assigner_cfg.get("center_radius", 2.5),
            candidate_topk=assigner_cfg.get("candidate_topk", 10),
            iou_weight=assigner_cfg.get("iou_weight", 3.0),
            cls_weight=assigner_cfg.get("cls_weight", 1.0),
            oks_weight=assigner_cfg.get("oks_weight", 3.0),
            vis_weight=assigner_cfg.get("vis_weight", 0.0),
            dynamic_k_indicator=assigner_cfg.get("dynamic_k_indicator", "iou"),
            use_keypoints_for_center=assigner_cfg.get("use_keypoints_for_center", False),
            oks_sigmas=oks_sigmas,
        )
        return r.fg_mask, r.matched_gt, r.matched_metric

    fg, mgt, metric = jax.vmap(one)(
        scores, bbox_d, kpt_d, vis_sig,
        batch["gt_bboxes"], batch["gt_labels"], batch["gt_keypoints"],
        batch["gt_keypoints_visible"], batch["gt_areas"], batch["gt_valid"],
    )
    idx = jnp.clip(mgt, 0, batch["gt_bboxes"].shape[1] - 1)

    def gather(arr):
        return jnp.take_along_axis(arr, idx.reshape(*idx.shape, *((1,) * (arr.ndim - 2))), axis=1)

    return dict(
        fg_mask=fg,  # (B, N) bool
        matched_metric=metric,  # (B, N)
        bbox_target=gather(batch["gt_bboxes"]),
        kpt_target=gather(batch["gt_keypoints"]),
        vis_target=gather(batch["gt_keypoints_visible"]),
        vis_weight=gather(batch.get("gt_vis_weights", batch["gt_keypoints_visible"] * 0 + 1)),
        area_target=gather(batch["gt_areas"][..., None])[..., 0],
        label_target=gather(batch["gt_labels"][..., None].astype(jnp.float32))[..., 0],
        num_fg=fg.sum(),
    )


def yolox_pose_loss(
    outputs: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    priors: np.ndarray,
    *,
    assigner_cfg: Dict[str, Any],
    oks_sigmas: Optional[np.ndarray],
    loss_oks,
    num_classes: int = 1,
    overlaps_power: float = 1.0,
    loss_cls_weight: float = 1.0,
    loss_obj_weight: float = 1.0,
    loss_bbox_weight: float = 5.0,
    loss_vis_weight: float = 1.0,
) -> Dict[str, jnp.ndarray]:
    """Dense masked YOLOX-Pose loss (reference ``loss`` :284-394)."""
    t = onestage_assign_batch(outputs, batch, priors, assigner_cfg, oks_sigmas)
    fg = t["fg_mask"].astype(jnp.float32)
    num_total = jnp.maximum(t["num_fg"].astype(jnp.float32), 1.0)
    K = outputs["kpt_decoded"].shape[-2]

    losses: Dict[str, jnp.ndarray] = {}
    # objectness: BCE summed over every prior / num_total (reference :350-352)
    obj_w = batch.get("obj_weights")
    obj_bce = _bce_logits(outputs["objectness"][..., 0], fg)
    if obj_w is not None:
        obj_bce = obj_bce * obj_w
    losses["loss_obj"] = obj_bce.sum() / num_total * loss_obj_weight

    # bbox IoU loss, mode=square, sum over fg / num_total (reference :355-357)
    from probpose_code_tpu.models.task_modules.assigners import bbox_overlaps

    ious = bbox_overlaps(outputs["bbox_decoded"], t["bbox_target"], is_aligned=True)
    ious = jnp.clip(ious, 1e-16, None)
    losses["loss_bbox"] = ((1 - ious**2) * fg).sum() / num_total * loss_bbox_weight

    # keypoint OKS loss, mean over fg (reference :359-361; OKSLoss linear)
    oks_per = loss_oks(outputs["kpt_decoded"], t["kpt_target"], t["vis_target"], t["area_target"])
    losses["loss_kpt"] = (oks_per * fg).sum() / num_total

    # visibility BCE, weighted mean over fg elements (reference :363-365)
    vis_bce = _bce_logits(outputs["kpt_vis"], t["vis_target"]) * t["vis_weight"]
    losses["loss_vis"] = (vis_bce * fg[..., None]).sum() / (num_total * K) * loss_vis_weight

    # classification: BCE(cls, onehot * metric^power) summed / num_total
    onehot = (t["label_target"][..., None] == jnp.arange(num_classes)[None, None, :]).astype(jnp.float32)
    cls_target = jax.lax.stop_gradient(onehot * (t["matched_metric"][..., None] ** overlaps_power))
    cls_bce = _bce_logits(outputs["cls_scores"], cls_target)
    losses["loss_cls"] = (cls_bce * fg[..., None]).sum() / num_total * loss_cls_weight
    return losses


@MODELS.register_module()
class YOLOXPoseHead(nn.Module):
    """Config-facing wrapper: module + static strides (losses built outside)."""

    num_keypoints: int
    head_module_cfg: Dict[str, Any]
    featmap_strides: Sequence[int] = (8, 16, 32)
    num_classes: int = 1
    prior_offset: float = 0.0
    centralize_points: bool = False

    def setup(self):
        cfg = dict(self.head_module_cfg)
        cfg.setdefault("num_keypoints", self.num_keypoints)
        cfg["featmap_strides"] = tuple(self.featmap_strides)
        cfg.pop("type", None)
        self.head_module = YOLOXPoseHeadModule(**cfg)

    def __call__(self, feats, train: bool = False):
        out = self.head_module(feats, train=train)
        featmap_sizes = tuple((f.shape[1], f.shape[2]) for f in feats)
        gen = MlvlPointGenerator(
            strides=list(self.featmap_strides), offset=self.prior_offset,
            centralize_points=self.centralize_points,
        )
        pj = jnp.asarray(gen.flat_priors(featmap_sizes, with_stride=True))
        out["priors"] = pj
        out["bbox_decoded"] = decode_bbox(out["bbox_preds"], pj[None, :, :2], pj[None, :, 2])
        out["kpt_decoded"] = decode_kpt_reg(out["kpt_offsets"], pj[None, :, :2], pj[None, :, 2])
        return out


def yolox_device_predict(outputs: Dict[str, jnp.ndarray], *, nms_pre: int = 300) -> Dict[str, jnp.ndarray]:
    """Static top-k candidate scoring (reference ``predict`` :632-741).

    Host completes with score_thr filtering + bbox NMS on <= nms_pre rows.
    """
    scores = jax.nn.sigmoid(outputs["cls_scores"])[..., 0] * jax.nn.sigmoid(outputs["objectness"])[..., 0]
    k = min(nms_pre, scores.shape[-1])
    top_scores, idx = jax.lax.top_k(scores, k)

    def gather(arr):
        return jax.vmap(lambda a, i: a[i])(arr, idx)

    return dict(
        scores=top_scores,
        bboxes=gather(outputs["bbox_decoded"]),
        keypoints=gather(outputs["kpt_decoded"]),
        keypoint_scores=jax.nn.sigmoid(gather(outputs["kpt_vis"])),
    )


def postprocess_onestage(
    device_out: Dict[str, Any],
    *,
    score_thr: float = 0.1,
    nms_thr: float = 0.65,
    input_size: Optional[Tuple[int, int]] = None,
):
    """Host tail of one-stage predict: threshold + bbox NMS per image.

    Mirrors reference ``yoloxpose_head.py:694-736`` / ``rtmo_head.py:912-966``.
    Returns per-image dicts of NumPy arrays (variable instance counts).
    """
    from probpose_code_tpu.evaluation.functional.nms import bbox_nms_np

    out = {k: np.asarray(v) for k, v in device_out.items()}
    results = []
    B = out["scores"].shape[0]
    for b in range(B):
        scores = out["scores"][b]
        keep = scores >= score_thr
        scores = scores[keep]
        bboxes = out["bboxes"][b][keep]
        kpts = out["keypoints"][b][keep]
        kvis = out["keypoint_scores"][b][keep]
        if len(scores) and nms_thr < 1.0:
            keep_nms = bbox_nms_np(bboxes, scores, nms_thr)
            scores, bboxes, kpts, kvis = scores[keep_nms], bboxes[keep_nms], kpts[keep_nms], kvis[keep_nms]
        if input_size is not None:
            bboxes[:, 0::2] = np.clip(bboxes[:, 0::2], 0, input_size[0])
            bboxes[:, 1::2] = np.clip(bboxes[:, 1::2], 0, input_size[1])
        results.append(
            dict(
                scores=scores,
                bboxes=bboxes,
                bbox_scores=scores,
                keypoints=kpts,
                keypoint_scores=kvis,
                keypoints_visible=kvis,
                labels=np.zeros(len(scores), dtype=np.int64),
            )
        )
    return results
