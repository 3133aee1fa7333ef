"""SimOTA positive-sample assignment — vectorized, static-shape, jit-safe.

Behavioral parity with the reference
``mmpose/models/task_modules/assigners/sim_ota_assigner.py:16-276`` and
``metric_calculators.py:19-102``, re-designed for XLA:

* The reference gathers valid priors with boolean indexing, loops over GT
  instances calling ``torch.topk`` with a *data-dependent* k, and mutates a
  matching matrix in Python — none of which trace under ``jit``. Here the
  whole assignment is masked dense algebra on (num_priors, num_gts) arrays
  with GT padded to a static maximum:
    - invalid (prior, gt) pairs carry a huge cost instead of being dropped;
    - dynamic-k selection becomes a rank test: a prior is selected for a GT
      iff its cost rank within that GT's column is below ``dynamic_k`` —
      exactly ``torch.topk(cost, k, largest=False)`` membership;
    - the conflict rule (a prior matched to several GTs keeps the argmin-cost
      GT, reference ``sim_ota_assigner.py:262-265``) is a masked argmin.
  The result is one fused XLA program, vmapped over the batch, with no
  host synchronization during training.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp
import numpy as np

from probpose_code_tpu.registry import TASK_UTILS

INF = 1e5
BIG = 1e15
EPS = 1e-7


def bbox_overlaps(
    bboxes1: jnp.ndarray, bboxes2: jnp.ndarray, mode: str = "iou", is_aligned: bool = False
) -> jnp.ndarray:
    """Pairwise (or aligned) IoU / GIoU between xyxy boxes.

    Matches mmdet-style ``bbox_overlaps`` used by the reference
    (``metric_calculators.py:27-66``).
    """
    area1 = (bboxes1[..., 2] - bboxes1[..., 0]) * (bboxes1[..., 3] - bboxes1[..., 1])
    area2 = (bboxes2[..., 2] - bboxes2[..., 0]) * (bboxes2[..., 3] - bboxes2[..., 1])

    if not is_aligned:
        b1 = bboxes1[..., :, None, :]
        b2 = bboxes2[..., None, :, :]
        union_area = area1[..., :, None] + area2[..., None, :]
    else:
        b1, b2 = bboxes1, bboxes2
        union_area = area1 + area2

    lt = jnp.maximum(b1[..., :2], b2[..., :2])
    rb = jnp.minimum(b1[..., 2:], b2[..., 2:])
    wh = jnp.clip(rb - lt, 0, None)
    overlap = wh[..., 0] * wh[..., 1]
    union = jnp.clip(union_area - overlap, EPS, None)
    ious = overlap / union
    if mode == "iou":
        return ious
    if mode == "giou":
        elt = jnp.minimum(b1[..., :2], b2[..., :2])
        erb = jnp.maximum(b1[..., 2:], b2[..., 2:])
        ewh = jnp.clip(erb - elt, 0, None)
        enclose = jnp.clip(ewh[..., 0] * ewh[..., 1], EPS, None)
        return ious - (enclose - union) / enclose
    raise ValueError(f"unsupported mode {mode}")


@TASK_UTILS.register_module()
class BBoxOverlaps2D:
    """IoU calculator (reference ``metric_calculators.py:19``)."""

    def __init__(self, scale: float = 1.0, dtype=None):
        self.scale = scale

    def __call__(self, bboxes1, bboxes2, mode: str = "iou", is_aligned: bool = False):
        return bbox_overlaps(bboxes1, bboxes2, mode=mode, is_aligned=is_aligned)


@TASK_UTILS.register_module()
class PoseOKS:
    """OKS similarity calculator (reference ``metric_calculators.py:74-102``).

    ``oks = sum_k w_k * exp(-(d_k / sqrt(area) / (2 sigma_k))^2 / 2)`` with
    visibility weights normalized to sum to 1.
    """

    def __init__(self, metainfo: Optional[str] = "configs/_base_/datasets/coco.py"):
        self.sigmas = None
        if metainfo is not None:
            from probpose_code_tpu.datasets.metainfo import get_metainfo

            name = metainfo.split("/")[-1].replace(".py", "") if "/" in str(metainfo) else metainfo
            try:
                info = get_metainfo(name)
                if info.get("sigmas") is not None:
                    self.sigmas = np.asarray(info["sigmas"], dtype=np.float32)
            except Exception:
                pass

    def __call__(self, output, target, target_weights, areas, eps: float = 1e-8):
        dist = jnp.linalg.norm(output - target, axis=-1)
        areas = jnp.reshape(areas, (*((1,) * (dist.ndim - 2)), -1, 1))
        dist = dist / jnp.clip(jnp.sqrt(areas), eps, None)
        if self.sigmas is not None:
            sigmas = jnp.asarray(self.sigmas).reshape(*((1,) * (dist.ndim - 1)), -1)
            dist = dist / (sigmas * 2)
        w = target_weights / jnp.clip(target_weights.sum(axis=-1, keepdims=True), eps, None)
        return (jnp.exp(-(dist**2) / 2) * w).sum(axis=-1)


@dataclass
class SimOTAResult:
    """Per-prior assignment for one image (all arrays static shape (N,...))."""

    fg_mask: jnp.ndarray  # (N,) bool
    matched_gt: jnp.ndarray  # (N,) int32, index into padded GT, -1 for bg
    matched_metric: jnp.ndarray  # (N,) iou/oks with the matched GT (0 for bg)
    num_fg: jnp.ndarray  # () int32


@TASK_UTILS.register_module()
class SimOTAAssigner:
    """Config-facing wrapper over :func:`simota_assign`."""

    def __init__(
        self,
        center_radius: float = 2.5,
        candidate_topk: int = 10,
        iou_weight: float = 3.0,
        cls_weight: float = 1.0,
        oks_weight: float = 3.0,
        vis_weight: float = 0.0,
        dynamic_k_indicator: str = "iou",
        use_keypoints_for_center: bool = False,
        iou_calculator: Optional[dict] = None,
        oks_calculator: Optional[dict] = None,
    ):
        assert dynamic_k_indicator in ("iou", "oks")
        self.center_radius = center_radius
        self.candidate_topk = candidate_topk
        self.iou_weight = iou_weight
        self.cls_weight = cls_weight
        self.oks_weight = oks_weight
        self.vis_weight = vis_weight
        self.dynamic_k_indicator = dynamic_k_indicator
        self.use_keypoints_for_center = use_keypoints_for_center
        oks_cfg = dict(oks_calculator or {"type": "PoseOKS"})
        oks_cfg.pop("type", None)
        self.oks_calculator = PoseOKS(**oks_cfg)

    def assign(self, *, priors, scores, bboxes, keypoints, keypoints_visible,
               gt_bboxes, gt_labels, gt_keypoints, gt_keypoints_visible, gt_areas,
               gt_valid) -> SimOTAResult:
        return simota_assign(
            priors, scores, bboxes, keypoints, keypoints_visible,
            gt_bboxes, gt_labels, gt_keypoints, gt_keypoints_visible, gt_areas, gt_valid,
            center_radius=self.center_radius,
            candidate_topk=self.candidate_topk,
            iou_weight=self.iou_weight,
            cls_weight=self.cls_weight,
            oks_weight=self.oks_weight,
            vis_weight=self.vis_weight,
            dynamic_k_indicator=self.dynamic_k_indicator,
            use_keypoints_for_center=self.use_keypoints_for_center,
            oks_sigmas=self.oks_calculator.sigmas,
        )


def simota_assign(
    priors: jnp.ndarray,  # (N, 4) cx, cy, stride_w, stride_h
    scores: jnp.ndarray,  # (N, C) sqrt(cls_prob * obj_prob)
    bboxes: jnp.ndarray,  # (N, 4) decoded xyxy
    keypoints: jnp.ndarray,  # (N, K, 2) decoded
    keypoints_visible: jnp.ndarray,  # (N, K) sigmoid probs
    gt_bboxes: jnp.ndarray,  # (G, 4) padded
    gt_labels: jnp.ndarray,  # (G,) int
    gt_keypoints: jnp.ndarray,  # (G, K, 2)
    gt_keypoints_visible: jnp.ndarray,  # (G, K)
    gt_areas: jnp.ndarray,  # (G,)
    gt_valid: jnp.ndarray,  # (G,) bool — False for padding rows
    *,
    center_radius: float = 2.5,
    candidate_topk: int = 10,
    iou_weight: float = 3.0,
    cls_weight: float = 1.0,
    oks_weight: float = 3.0,
    vis_weight: float = 0.0,
    dynamic_k_indicator: str = "iou",
    use_keypoints_for_center: bool = False,
    oks_sigmas: Optional[np.ndarray] = None,
) -> SimOTAResult:
    """One image's SimOTA assignment as dense masked algebra. See module doc."""
    N = priors.shape[0]
    G = gt_bboxes.shape[0]
    gt_valid = gt_valid.astype(bool)

    # ---- geometric gating (reference get_in_gt_and_in_center_info) ----
    px, py = priors[:, 0:1], priors[:, 1:2]  # (N, 1)
    sx, sy = priors[:, 2:3], priors[:, 3:4]
    in_gt = (
        jnp.minimum(
            jnp.minimum(px - gt_bboxes[None, :, 0], py - gt_bboxes[None, :, 1]),
            jnp.minimum(gt_bboxes[None, :, 2] - px, gt_bboxes[None, :, 3] - py),
        )
        > 0
    )  # (N, G)

    gt_cx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) / 2
    gt_cy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) / 2
    if use_keypoints_for_center:
        vis = gt_keypoints_visible
        denom = jnp.clip(vis.sum(-1, keepdims=True), 1e-8, None)
        kpt_ct = (gt_keypoints * vis[..., None]).sum(-2) / denom
        has_vis = vis.sum(-1) > 0
        gt_cx = jnp.where(has_vis, kpt_ct[:, 0], gt_cx)
        gt_cy = jnp.where(has_vis, kpt_ct[:, 1], gt_cy)

    in_ct = (
        jnp.minimum(
            jnp.minimum(px - (gt_cx[None] - center_radius * sx), py - (gt_cy[None] - center_radius * sy)),
            jnp.minimum((gt_cx[None] + center_radius * sx) - px, (gt_cy[None] + center_radius * sy) - py),
        )
        > 0
    )  # (N, G)

    in_gt = in_gt & gt_valid[None, :]
    in_ct = in_ct & gt_valid[None, :]
    valid_prior = in_gt.any(-1) | in_ct.any(-1)  # (N,)
    in_both = in_gt & in_ct  # (N, G)
    pair_ok = valid_prior[:, None] & gt_valid[None, :]

    # ---- pairwise metrics ----
    ious = bbox_overlaps(bboxes, gt_bboxes)  # (N, G)
    dist = jnp.linalg.norm(keypoints[:, None] - gt_keypoints[None], axis=-1)  # (N, G, K)
    dist = dist / jnp.clip(jnp.sqrt(gt_areas)[None, :, None], 1e-8, None)
    if oks_sigmas is not None:
        dist = dist / (jnp.asarray(oks_sigmas)[None, None, :] * 2)
    w = gt_keypoints_visible / jnp.clip(gt_keypoints_visible.sum(-1, keepdims=True), 1e-8, None)
    oks = (jnp.exp(-(dist**2) / 2) * w[None]).sum(-1)  # (N, G)

    # ---- cost matrix (reference sim_ota_assigner.py:125-173) ----
    cost = (~in_both).astype(jnp.float32) * INF
    if iou_weight > 0:
        cost = cost + (-jnp.log(ious + EPS)) * iou_weight
    if oks_weight > 0 or dynamic_k_indicator == "oks":
        cost = cost + (-jnp.log(oks + EPS)) * oks_weight
    if cls_weight > 0:
        # BCE(score, onehot(gt_label)) summed over classes
        onehot = (gt_labels[None, :, None] == jnp.arange(scores.shape[-1])[None, None, :]).astype(jnp.float32)
        s = jnp.clip(scores[:, None, :], EPS, 1 - EPS)
        bce = -(onehot * jnp.log(s) + (1 - onehot) * jnp.log(1 - s)).sum(-1)
        cost = cost + bce * cls_weight
    if vis_weight > 0:
        v = jnp.clip(keypoints_visible[:, None, :], EPS, 1 - EPS)
        gv = gt_keypoints_visible[None].astype(jnp.float32)
        bce_v = -(gv * jnp.log(v) + (1 - gv) * jnp.log(1 - v)).sum(-1)
        cost = cost + bce_v * vis_weight

    cost = jnp.where(pair_ok, cost, BIG)

    # ---- dynamic-k (reference dynamic_k_matching) ----
    metric = ious if dynamic_k_indicator == "iou" else oks
    metric = jnp.where(pair_ok, metric, 0.0)
    k = min(candidate_topk, N)
    topk_vals = -jnp.sort(-metric, axis=0)[:k]  # (k, G)
    dynamic_k = jnp.clip(topk_vals.sum(0).astype(jnp.int32), 1, None)  # (G,)

    # rank of each prior within each GT column (ascending cost); a prior is
    # selected iff rank < dynamic_k — identical membership to topk(largest=False)
    order = jnp.argsort(cost, axis=0)
    ranks = jnp.argsort(order, axis=0)  # (N, G)
    select = (ranks < dynamic_k[None, :]) & pair_ok  # (N, G)

    # conflict resolution: prior matched to >1 GT keeps argmin-cost GT
    nmatch = select.sum(-1)
    argmin_gt = jnp.argmin(cost, axis=-1)  # (N,)
    first_gt = jnp.argmax(select, axis=-1)  # first selected column
    matched_gt = jnp.where(nmatch > 1, argmin_gt, first_gt).astype(jnp.int32)
    fg_mask = nmatch > 0
    matched_gt = jnp.where(fg_mask, matched_gt, -1)

    matched_metric = jnp.where(
        fg_mask, jnp.take_along_axis(metric, jnp.clip(matched_gt, 0, G - 1)[:, None], axis=1)[:, 0], 0.0
    )
    return SimOTAResult(
        fg_mask=fg_mask,
        matched_gt=matched_gt,
        matched_metric=matched_metric,
        num_fg=fg_mask.sum().astype(jnp.int32),
    )
