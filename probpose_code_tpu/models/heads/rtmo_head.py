"""RTMO one-stage head with Dynamic Coordinate Classifier (DCC).

Behavioral parity with reference
``mmpose/models/heads/hybrid_heads/rtmo_head.py`` (RTMOHeadModule :24-225,
DCC :228-555, RTMOHead loss :724-845, predict :847-970). TPU-native design:

* the head module splits each level's channels into cls/pose halves
  (:205) and emits dense flattened (B, N, .) tensors;
* during training the DCC runs on a *static-size* set of MAX_POS candidate
  priors gathered from the SimOTA foreground mask (top-scoring fg first),
  instead of the reference's dynamic boolean indexing — padding rows are
  masked out of every loss and out of the masked BatchNorm statistics;
* at inference the DCC runs on a static top-k candidate set selected with
  ``jax.lax.top_k``, so the whole predict path is one jitted program; the
  tiny (<= k) NMS runs on host.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from probpose_code_tpu.registry import MODELS
from probpose_code_tpu.models.backbones.cspnext import ConvModule
from probpose_code_tpu.models.task_modules import MlvlPointGenerator
from probpose_code_tpu.models.utils.transformer import GAUEncoder, sine_pos_encoding
from .yoloxpose_head import ConvTower, _bce_logits, _flatten_levels, decode_bbox, decode_kpt_reg, onestage_assign_batch

EPS = 1e-8


@MODELS.register_module()
class RTMOHeadModule(nn.Module):
    """cls + grouped-conv pose towers (reference :24-225)."""

    num_keypoints: int
    in_channels: int
    num_classes: int = 1
    widen_factor: float = 1.0
    cls_feat_channels: int = 256
    stacked_convs: int = 2
    num_groups: int = 8
    channels_per_group: int = 36
    pose_vec_channels: int = -1
    featmap_strides: Sequence[int] = (16, 32)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Tuple[jnp.ndarray, ...], train: bool = False) -> Dict[str, Any]:
        cls_fc = int(self.cls_feat_channels * self.widen_factor)
        pose_ch = self.num_groups * int(self.widen_factor * self.channels_per_group)
        prior_bias = float(-np.log((1 - 0.01) / 0.01))
        cls_s, bboxes, kpts, kvis, pvecs = [], [], [], [], []
        for i, x in enumerate(feats):
            half = x.shape[-1] // 2
            cls_feat, reg_feat = x[..., :half], x[..., half:]
            cf = ConvTower(cls_fc, self.stacked_convs, dtype=self.dtype, name=f"conv_cls{i}")(cls_feat, train=train)
            pf = reg_feat
            for j in range(self.stacked_convs * 2):
                g = 1 if j == 0 else self.num_groups
                pf = ConvModule(pose_ch, 3, groups=g, dtype=self.dtype, name=f"conv_pose{i}_{j}")(pf, train=train)
            cls_s.append(nn.Conv(self.num_classes, (1, 1), name=f"out_cls{i}",
                                 bias_init=nn.initializers.constant(prior_bias))(cf))
            bboxes.append(nn.Conv(4, (1, 1), name=f"out_bbox{i}")(pf))
            kpts.append(nn.Conv(self.num_keypoints * 2, (1, 1), name=f"out_kpt_reg{i}")(pf))
            kvis.append(nn.Conv(self.num_keypoints, (1, 1), name=f"out_kpt_vis{i}")(pf))
            if self.pose_vec_channels > 0:
                pvecs.append(nn.Conv(self.pose_vec_channels, (1, 1), name=f"out_pose{i}")(pf))
            else:
                pvecs.append(pf)
        B = feats[0].shape[0]
        return dict(
            cls_scores=_flatten_levels(cls_s, self.num_classes).astype(jnp.float32),
            bbox_preds=_flatten_levels(bboxes, 4).astype(jnp.float32),
            kpt_offsets=_flatten_levels(kpts, self.num_keypoints * 2).reshape(
                B, -1, self.num_keypoints, 2
            ).astype(jnp.float32),
            kpt_vis=_flatten_levels(kvis, self.num_keypoints).astype(jnp.float32),
            pose_vecs=_flatten_levels(pvecs, pvecs[0].shape[-1]).astype(jnp.float32),
        )


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over valid rows only (train form; running stats kept).

    Replaces the reference DCC's ``nn.BatchNorm1d`` (:286) which operates on
    the dynamically gathered positive samples — here padding rows must not
    pollute the statistics.
    """

    features: int
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None, train: bool = False):
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(self.features))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(self.features))
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if train:
            if mask is None:
                mean = x.mean(axis=tuple(range(x.ndim - 1)))
                var = x.var(axis=tuple(range(x.ndim - 1)))
            else:
                m = mask.astype(x.dtype)
                while m.ndim < x.ndim:
                    m = m[..., None]
                n = jnp.clip(m.sum(), 1.0, None)
                mean = (x * m).sum(axis=tuple(range(x.ndim - 1))) / n
                var = ((x - mean) ** 2 * m).sum(axis=tuple(range(x.ndim - 1))) / n
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        return (x - mean) / jnp.sqrt(var + self.epsilon) * scale + bias


class DCC(nn.Module):
    """Dynamic Coordinate Classifier (reference ``rtmo_head.py:228-555``).

    Pose feature -> K keypoint features (FC + BN + GAU); per-candidate x/y
    bins spanning the padded predicted bbox are sine-encoded and projected;
    1-D heatmaps = kpt_feats @ bins_enc^T, softmaxed; coordinates are the
    heatmap-weighted bin sums. ``sigma_fc`` predicts per-keypoint Laplace
    spread for the MLE target heatmaps (:404-441).
    """

    in_channels: int
    num_keypoints: int
    feat_channels: int
    num_bins: Tuple[int, int]
    spe_channels: int = 128
    spe_temperature: float = 300.0
    gau_s: int = 128
    gau_expansion: int = 2
    dtype: Any = jnp.float32

    def _bins(self):
        return (
            np.linspace(-0.5, 0.5, self.num_bins[0], dtype=np.float32),
            np.linspace(-0.5, 0.5, self.num_bins[1], dtype=np.float32),
        )

    def _dynamic_bins(self, bbox_cs, grids):
        x_b, y_b = self._bins()
        center = bbox_cs[..., :2] - grids
        scale = bbox_cs[..., 2:]
        x_bins = jnp.asarray(x_b) * scale[..., 0:1] + center[..., 0:1]
        y_bins = jnp.asarray(y_b) * scale[..., 1:2] + center[..., 1:2]
        return x_bins, y_bins  # (..., num_bins)

    @staticmethod
    def _softmax(hms):
        hms = jnp.clip(hms, -5e4, 5e4)
        hms = hms - jax.lax.stop_gradient(hms.max(axis=-1, keepdims=True))
        e = jnp.exp(hms)
        return e / (e.sum(axis=-1, keepdims=True) + EPS)

    @nn.compact
    def __call__(
        self,
        pose_feats: jnp.ndarray,  # (..., M, C)
        bbox_cs: jnp.ndarray,  # (..., M, 4) center+scale relative to image
        grids: jnp.ndarray,  # (..., M, 2) prior centers
        mask: Optional[jnp.ndarray] = None,  # (..., M) valid rows
        train: bool = False,
    ):
        sigmas = nn.Dense(self.num_keypoints, name="sigma_fc")(pose_feats)
        sigmas = jax.nn.sigmoid(sigmas) * self.param("sigma_scale", nn.initializers.constant(0.1), ())

        x_bins, y_bins = self._dynamic_bins(bbox_cs, grids)
        x_enc = nn.Dense(self.feat_channels, name="x_fc")(
            sine_pos_encoding(x_bins, self.spe_channels, self.spe_temperature)
        )
        y_enc = nn.Dense(self.feat_channels, name="y_fc")(
            sine_pos_encoding(y_bins, self.spe_channels, self.spe_temperature)
        )

        k_feats = nn.Dense(self.feat_channels * self.num_keypoints, name="pose_to_kpts")(pose_feats)
        k_feats = MaskedBatchNorm(self.feat_channels * self.num_keypoints, name="pose_bn")(
            k_feats, mask=mask, train=train
        )
        k_feats = k_feats.reshape(*k_feats.shape[:-1], self.num_keypoints, self.feat_channels)
        pos_enc = self.param("pos_enc", nn.initializers.normal(1.0), (self.num_keypoints, self.gau_s))
        k_feats = GAUEncoder(
            in_token_dims=self.feat_channels, out_token_dims=self.feat_channels,
            expansion_factor=self.gau_expansion, s=self.gau_s, pos_enc="add", dtype=self.dtype, name="gau",
        )(k_feats, pos_enc=pos_enc)

        x_hms = self._softmax(jnp.einsum("...kc,...bc->...kb", k_feats, x_enc))
        y_hms = self._softmax(jnp.einsum("...kc,...bc->...kb", k_feats, y_enc))
        x = (x_hms * x_bins[..., None, :]).sum(-1)
        y = (y_hms * y_bins[..., None, :]).sum(-1)
        pose_preds = jnp.stack([x, y], axis=-1)
        return pose_preds, (x_hms, y_hms), sigmas

    def generate_target_heatmap(self, kpt_targets, bbox_cs, grids, sigmas, areas):
        """Laplace target 1-D heatmaps (reference :404-441). Pure function."""
        x_bins, y_bins = self._dynamic_bins(bbox_cs, grids)
        dist_x = jnp.abs(kpt_targets[..., 0:1] - x_bins[..., None, :])
        dist_y = jnp.abs(kpt_targets[..., 1:2] - y_bins[..., None, :])
        areas = jnp.clip(jnp.sqrt(areas), 1.0, None)[..., None, None]
        sig = jnp.clip(sigmas, 1e-3, None)[..., None]
        dist_x = dist_x / areas / sig
        dist_y = dist_y / areas / sig
        return jnp.exp(-dist_x / 2) / sig, jnp.exp(-dist_y / 2) / sig


def _topk_gather(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(B, N, ...) gathered at (B, M) -> (B, M, ...)."""
    return jax.vmap(lambda a, i: a[i])(arr, idx)


def bbox_xyxy2cs_j(bbox: jnp.ndarray, padding: float = 1.25) -> jnp.ndarray:
    center = (bbox[..., :2] + bbox[..., 2:]) / 2
    scale = (bbox[..., 2:] - bbox[..., :2]) * padding
    return jnp.concatenate([center, scale], axis=-1)


@MODELS.register_module()
class RTMOHead(nn.Module):
    """RTMO head: module + DCC; losses assembled in ``rtmo_loss``."""

    num_keypoints: int
    head_module_cfg: Dict[str, Any]
    dcc_cfg: Dict[str, Any]
    featmap_strides: Sequence[int] = (16, 32)
    num_classes: int = 1
    bbox_padding: float = 1.25

    def setup(self):
        cfg = dict(self.head_module_cfg)
        cfg.setdefault("num_keypoints", self.num_keypoints)
        cfg["featmap_strides"] = tuple(self.featmap_strides)
        cfg.pop("type", None)
        self.head_module = RTMOHeadModule(**cfg)
        dcc = dict(self.dcc_cfg)
        dcc.pop("type", None)
        gau_cfg = dcc.pop("gau_cfg", None) or {}
        dcc["num_bins"] = tuple(dcc.get("num_bins", (192, 256)))
        dcc.setdefault("num_keypoints", self.num_keypoints)
        if gau_cfg:
            dcc["gau_s"] = gau_cfg.get("s", 128)
            dcc["gau_expansion"] = gau_cfg.get("expansion_factor", 2)
        self.dcc = DCC(**dcc)

    def __call__(self, feats, train: bool = False):
        out = self.head_module(feats, train=train)
        featmap_sizes = tuple((f.shape[1], f.shape[2]) for f in feats)
        gen = MlvlPointGenerator(strides=list(self.featmap_strides), centralize_points=True)
        pj = jnp.asarray(gen.flat_priors(featmap_sizes, with_stride=True))
        out["priors"] = pj
        out["objectness"] = jnp.ones_like(out["cls_scores"][..., :1]) * 1e4  # reference :757
        out["bbox_decoded"] = decode_bbox(out["bbox_preds"], pj[None, :, :2], pj[None, :, 2])
        out["kpt_decoded"] = decode_kpt_reg(out["kpt_offsets"], pj[None, :, :2], pj[None, :, 2])
        return out

    def dcc_forward(self, pose_feats, bbox_cs, grids, mask=None, train: bool = False):
        return self.dcc(pose_feats, bbox_cs, grids, mask=mask, train=train)


def rtmo_select_pos(
    targets: Dict[str, jnp.ndarray], outputs: Dict[str, jnp.ndarray], max_pos: int
) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray, jnp.ndarray]:
    """Pick a static MAX_POS subset of foreground priors per batch.

    Returns (gathered dict, pos_mask (B, M), pos_idx (B, M)). Foreground
    priors come first (by matched metric); padding rows are masked.
    """
    fg = targets["fg_mask"]
    score = jnp.where(fg, targets["matched_metric"] + 1.0, 0.0)  # fg first
    max_pos = min(max_pos, score.shape[-1])
    _, idx = jax.lax.top_k(score, max_pos)  # (B, M)
    pos_mask = _topk_gather(fg, idx)
    g = {k: _topk_gather(v, idx) for k, v in targets.items() if k not in ("num_fg",)}
    return g, pos_mask, idx


def rtmo_loss(
    outputs: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    dcc_apply,  # callable(pose_feats, bbox_cs, grids, mask, train) via module.apply
    dcc_target_heatmap,  # DCC.generate_target_heatmap bound pure fn
    *,
    assigner_cfg: Dict[str, Any],
    oks_sigmas: Optional[np.ndarray],
    loss_oks,
    loss_mle_weight: float = 1.0,
    loss_cls,  # VariFocalLoss instance (reduction handled here)
    loss_bbox_weight: float = 5.0,
    loss_vis_weight: float = 1.0,
    overlaps_power: float = 0.5,
    bbox_padding: float = 1.25,
    proxy_target_cc: bool = False,
    max_pos: int = 128,
    num_classes: int = 1,
) -> Dict[str, jnp.ndarray]:
    """Dense masked RTMO loss (reference ``rtmo_head.py:724-845``)."""
    t = onestage_assign_batch(outputs, batch, outputs["priors"], assigner_cfg, oks_sigmas)
    num_total = jnp.maximum(t["num_fg"].astype(jnp.float32), 1.0)
    K = outputs["kpt_decoded"].shape[-2]

    # static positive subset for the pose losses
    g, pos_mask, idx = rtmo_select_pos(t, outputs, max_pos)
    pm = pos_mask.astype(jnp.float32)
    bbox_preds = _topk_gather(outputs["bbox_decoded"], idx)
    kpt_reg_preds = _topk_gather(outputs["kpt_decoded"], idx)
    kpt_vis_preds = _topk_gather(outputs["kpt_vis"], idx)
    pose_vecs = _topk_gather(outputs["pose_vecs"], idx)
    pos_priors = _topk_gather(jnp.broadcast_to(outputs["priors"][None], (pm.shape[0],) + outputs["priors"].shape), idx)

    losses: Dict[str, jnp.ndarray] = {}
    from probpose_code_tpu.models.task_modules.assigners import bbox_overlaps

    # bbox IoU loss (square, sum / num_total)
    ious = jnp.clip(bbox_overlaps(bbox_preds, g["bbox_target"], is_aligned=True), 1e-16, None)
    losses["loss_bbox"] = ((1 - ious**2) * pm).sum() / num_total * loss_bbox_weight

    # visibility BCE (weighted mean over fg elements)
    vis_bce = _bce_logits(kpt_vis_preds, g["vis_target"]) * g["vis_weight"]
    losses["loss_vis"] = (vis_bce * pm[..., None]).sum() / (num_total * K) * loss_vis_weight

    # DCC: MLE coordinate-classification loss
    bbox_cs = bbox_xyxy2cs_j(jax.lax.stop_gradient(bbox_preds), bbox_padding)
    kpt_cc_preds, (x_hms, y_hms), sigmas = dcc_apply(
        pose_vecs, bbox_cs, pos_priors[..., :2], pos_mask, True
    )
    tgt_x, tgt_y = dcc_target_heatmap(g["kpt_target"], bbox_cs, pos_priors[..., :2], sigmas, g["area_target"])
    prob = (x_hms * tgt_x).sum(-1) * (y_hms * tgt_y).sum(-1)  # (B, M, K)
    mle = -jnp.log(prob + 1e-4)
    mle = jnp.where(jnp.isnan(mle), 0.0, mle)
    mle = mle * g["vis_target"]
    losses["loss_mle"] = (mle.mean(-1) * pm).sum() / num_total * loss_mle_weight

    # keypoint OKS loss; optionally proxy-regression toward DCC predictions
    cls_metric = g["matched_metric"]
    if proxy_target_cc:
        diff_cc = jnp.linalg.norm(jax.lax.stop_gradient(kpt_cc_preds) - g["kpt_target"], axis=-1)
        diff_reg = jnp.linalg.norm(jax.lax.stop_gradient(kpt_reg_preds) - g["kpt_target"], axis=-1)
        w_reg = g["vis_target"] * (diff_reg > diff_cc).astype(jnp.float32)
        oks_per = loss_oks(kpt_reg_preds, jax.lax.stop_gradient(kpt_cc_preds), w_reg, g["area_target"])
        # cls target becomes OKS(dcc preds, gt)
        dist = jnp.linalg.norm(jax.lax.stop_gradient(kpt_cc_preds) - g["kpt_target"], axis=-1)
        dist = dist / jnp.clip(jnp.sqrt(g["area_target"]), 1e-8, None)[..., None]
        if oks_sigmas is not None:
            dist = dist / (jnp.asarray(oks_sigmas)[None, None, :] * 2)
        wv = g["vis_target"] / jnp.clip(g["vis_target"].sum(-1, keepdims=True), 1e-8, None)
        cls_metric = (jnp.exp(-(dist**2) / 2) * wv).sum(-1)
    else:
        oks_per = loss_oks(kpt_reg_preds, g["kpt_target"], g["vis_target"], g["area_target"])
    losses["loss_oks"] = (oks_per * pm).sum() / num_total

    # classification (VariFocal on all priors; fg targets = metric^power)
    cls_target_pos = jax.lax.stop_gradient(cls_metric**overlaps_power) * pm
    obj_targets = jnp.zeros_like(outputs["cls_scores"][..., 0])
    obj_targets = jax.vmap(lambda o, i, v: o.at[i].set(v))(obj_targets, idx, cls_target_pos)
    obj_w = batch.get("obj_weights", jnp.ones_like(obj_targets))
    cls_loss_raw = loss_cls(outputs["cls_scores"][..., 0], obj_targets, obj_w)
    losses["loss_cls"] = cls_loss_raw / num_total
    return losses


def rtmo_device_predict(
    outputs: Dict[str, jnp.ndarray],
    dcc_apply,
    *,
    nms_pre: int = 300,
    bbox_padding: float = 1.25,
) -> Dict[str, jnp.ndarray]:
    """Static top-k candidate scoring + DCC decode (reference :847-970).

    Host completes with score_thr filtering + bbox NMS on <= nms_pre rows.
    """
    scores = jax.nn.sigmoid(outputs["cls_scores"])[..., 0]  # (B, N), 1 class
    k = min(nms_pre, scores.shape[-1])
    top_scores, idx = jax.lax.top_k(scores, k)
    bboxes = _topk_gather(outputs["bbox_decoded"], idx)
    kpt_vis = jax.nn.sigmoid(_topk_gather(outputs["kpt_vis"], idx))
    pose_vecs = _topk_gather(outputs["pose_vecs"], idx)
    B = scores.shape[0]
    priors = jnp.broadcast_to(outputs["priors"][None], (B,) + outputs["priors"].shape)
    grids = _topk_gather(priors, idx)[..., :2]
    bbox_cs = bbox_xyxy2cs_j(bboxes, bbox_padding)
    keypoints, _, _ = dcc_apply(pose_vecs, bbox_cs, grids, None, False)
    return dict(scores=top_scores, bboxes=bboxes, keypoints=keypoints, keypoint_scores=kpt_vis)
