"""Top-down pose estimator: composition module + jitted loss/predict programs.

Parity targets:
- ``TopdownPoseEstimator`` (reference ``pose_estimators/topdown.py:13``):
  backbone (+ neck) -> head; predict with flip-TTA; loss dispatch.
- ``PoseDataPreprocessor`` (reference ``data_preprocessors/data_preprocessor.py:14``):
  channel flip + mean/std normalize — here a pure function fused into the
  jitted program instead of a host-side module.
- ProbMapHead.loss (reference ``probmap_head.py:806-942``) including the
  on-the-fly GT OKS / error targets. The reference round-trips heatmaps to
  CPU every training step (``_error_from_heatmaps:474`` / ``_oks_from_heatmaps:510``);
  here the fast decode (argmax + DARK-UDP) runs on device inside the same
  jitted step (ops.decode.argmax_probmap_decode_batch).

Training-time quality monitors (acc_pose PCK, balanced binary accs, MAEs —
reference ``probmap_head.py:904-940``) are computed on device; the balanced
accuracy uses the exact per-class mean formulation instead of the
reference's random balanced subsample (same expectation, deterministic).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from probpose_code_tpu.codecs.utils.oks_map import COCO_KPT_SIGMAS
from probpose_code_tpu.ops.decode import (
    argmax_probmap_decode_batch,
    heatmap_expected_value_batch,
)
from probpose_code_tpu.ops.heatmap import heatmap_maximum_batch
from probpose_code_tpu.ops.tta import flip_heatmaps
from probpose_code_tpu.registry import MODELS


@MODELS.register_module()
class TopdownPoseEstimator(nn.Module):
    """backbone (+ neck) -> head, NHWC in, head-native outputs."""

    backbone: nn.Module
    head: nn.Module
    neck: Optional[nn.Module] = None

    def extract_feat(self, inputs: jnp.ndarray, train: bool = False, frame_weights=None):
        if inputs.ndim == 5:
            # multi-frame clip (B, T, H, W, 3): run the backbone on every
            # frame, then temporally align supports to the key frame
            # (PoseWarper; reference posewarper_neck.py consumed through
            # the same neck slot)
            B, T = inputs.shape[:2]
            flat = inputs.reshape((B * T,) + inputs.shape[2:])
            feats = self.backbone(flat, train=train)
            f = feats[-1] if isinstance(feats, (tuple, list)) else feats
            f = f.reshape((B, T) + f.shape[1:])
            key = f[:, 0]
            supports = [f[:, t] for t in range(1, T)]
            if self.neck is not None:
                return (self.neck(key, supports, frame_weights=frame_weights),)
            return (key,)
        feats = self.backbone(inputs, train=train)
        if self.neck is not None:
            feats = self.neck(feats)
        return feats

    def __call__(self, inputs: jnp.ndarray, train: bool = False):
        feats = self.extract_feat(inputs, train=train)
        return self.head(feats, train=train)


def preprocess_inputs(
    images: jnp.ndarray,
    mean: Tuple[float, float, float],
    std: Tuple[float, float, float],
    bgr_to_rgb: bool = True,
) -> jnp.ndarray:
    """(B, H, W, 3) raw 0-255 -> normalized float32 (fused into the jit)."""
    x = images.astype(jnp.float32)
    if bgr_to_rgb:
        x = x[..., ::-1]
    mean = jnp.asarray(mean, dtype=jnp.float32)
    std = jnp.asarray(std, dtype=jnp.float32)
    return (x - mean) / std


# --------------------------------------------------------------------------
# ProbMap head: training targets + losses (all on device)
# --------------------------------------------------------------------------


def _fast_decode_to_input_space(heatmaps: jnp.ndarray, input_size: Tuple[int, int]) -> jnp.ndarray:
    """ArgMaxProbMap fast decode -> input-space coords (B, K, 2)."""
    B, K, H, W = heatmaps.shape
    locs, _ = argmax_probmap_decode_batch(heatmaps, 11)
    scale = jnp.asarray([input_size[0] / (W - 1), input_size[1] / (H - 1)], dtype=jnp.float32)
    return locs * scale


def compute_oks_targets(
    gt_coords: jnp.ndarray,
    dt_coords: jnp.ndarray,
    weight: jnp.ndarray,
    kpt_sigmas: Optional[np.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-keypoint OKS between decoded GT and prediction coordinates.

    Vectorized equivalent of reference ``probmap_head.py:compute_oks:1078``
    with its training-time constants: fixed bbox (w=64, h=48), use_area=False
    (area = 64*48*0.53), per_kpt=True. ``weight`` (B, K) gates keypoints;
    instances with no valid keypoint get an all-zero target and weight 0.
    """
    sigmas = jnp.asarray(kpt_sigmas if kpt_sigmas is not None else COCO_KPT_SIGMAS, dtype=jnp.float32)
    K = gt_coords.shape[1]
    sigmas = sigmas[:K]
    vars_ = (sigmas * 2) ** 2  # (K,)
    tmparea = 48.0 * 64.0 * 0.53

    w = weight.astype(jnp.float32)
    g = gt_coords * w[..., None]
    d = dt_coords * w[..., None]
    valid = w > 0  # visibility condition vg > 0 (vg = 2 * weight)
    k1 = valid.sum(axis=1)  # (B,)

    dx = d[..., 0] - g[..., 0]
    dy = d[..., 1] - g[..., 1]
    e = (dx**2 + dy**2) / vars_[None] / (tmparea + 1e-9) / 2.0
    oks = jnp.exp(-e) * valid  # zero out invisible per reference per_kpt path
    oks = jnp.where((k1 > 0)[:, None], oks, 0.0)
    oks_weight = (k1 > 0).astype(jnp.float32)
    return oks, oks_weight


def _balanced_visibility_weights(annotated_in, gt_vis, gt_annotated):
    """Reference ``probmap_head.py:883-889``: reweight annotated keypoints so
    invisible and visible populations contribute equally."""
    invisible_in = (gt_vis == 0) & (gt_annotated > 0.5)
    visible_in = (gt_vis > 0) & (gt_annotated > 0.5)
    w = annotated_in.astype(jnp.float32)
    inv_w = 1.0 / (invisible_in.sum() + 1e-10)
    vis_w = 1.0 / (visible_in.sum() + 1e-10)
    w = jnp.where(invisible_in, inv_w, w)
    w = jnp.where(visible_in, vis_w, w)
    positive_min = jnp.min(jnp.where(w > 0, w, jnp.inf))
    positive_min = jnp.where(jnp.isfinite(positive_min), positive_min, 1.0)
    return w / positive_min


def _pose_pck_accuracy(dt_heatmaps, gt_heatmaps, mask, thr: float = 0.05):
    """Device PCK monitor (reference ``functional/keypoint_eval.py:pose_pck_accuracy``):
    argmax coords, normalized by heatmap_size/10, threshold 0.05."""
    B, K, H, W = dt_heatmaps.shape
    dt_locs, _ = heatmap_maximum_batch(dt_heatmaps)
    gt_locs, _ = heatmap_maximum_batch(gt_heatmaps)
    norm = jnp.asarray([W, H], dtype=jnp.float32) / 10.0
    dist = jnp.linalg.norm((dt_locs - gt_locs) / norm, axis=-1)  # (B, K)
    valid = mask & (gt_locs[..., 0] >= 0)
    correct = (dist < thr * 10.0) & valid
    denom = jnp.maximum(valid.sum(), 1)
    return correct.sum() / denom


def _balanced_binary_accuracy(dt, gt, mask):
    """Best-threshold balanced accuracy monitor (deterministic version of
    reference ``get_binary_accuracy`` with force_balanced=True)."""
    thresholds = jnp.arange(0.1, 1.0, 0.05)
    gt_b = gt > 0.5
    m = mask.astype(jnp.float32)
    pos = (gt_b & (mask > 0)).astype(jnp.float32)
    neg = ((~gt_b) & (mask > 0)).astype(jnp.float32)
    n_pos = jnp.maximum(pos.sum(), 1.0)
    n_neg = jnp.maximum(neg.sum(), 1.0)

    preds = dt[None] > thresholds[:, None, None]  # (T, B, K)
    tp = (preds * pos[None]).sum(axis=(1, 2))
    tn = ((~preds) * neg[None]).sum(axis=(1, 2))
    balanced = 0.5 * (tp / n_pos + tn / n_neg)
    has_both = (pos.sum() > 0) & (neg.sum() > 0)
    del m
    return jnp.where(has_both, balanced.max(), 0.0)


def probmap_head_loss(
    outputs: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    loss_modules: Dict[str, Any],
    head_cfg: Dict[str, Any],
    input_size: Tuple[int, int] = (192, 256),
    compute_acc: bool = True,
) -> Dict[str, jnp.ndarray]:
    """ProbMapHead loss dict (reference ``probmap_head.py:806-942``)."""
    dt_heatmaps = outputs["heatmaps"]
    B, C, H, W = dt_heatmaps.shape
    dt_probs = outputs["probabilities"].reshape(B, C)
    dt_vis = outputs["visibilities"].reshape(B, C)
    dt_oks = outputs["oks"].reshape(B, C)
    dt_errs = outputs["errors"].reshape(B, C)

    gt_heatmaps = batch["heatmaps"]
    gt_probs = batch["in_image"].astype(jnp.float32).reshape(B, C)
    gt_annotated = batch["annotated"].astype(jnp.float32).reshape(B, C)
    gt_vis = batch["keypoints_visibility"].astype(jnp.float32).reshape(B, C)
    keypoint_weights = batch["keypoint_weights"].reshape(B, C)

    freeze_oks = head_cfg.get("freeze_oks", False)
    freeze_error = head_cfg.get("freeze_error", True)

    # on-device GT target computation (no CPU round-trip)
    need_decode = (not freeze_error) or (not freeze_oks)
    if need_decode:
        gt_coords = _fast_decode_to_input_space(jax.lax.stop_gradient(gt_heatmaps), input_size)
        dt_coords = _fast_decode_to_input_space(jax.lax.stop_gradient(dt_heatmaps), input_size)
    if freeze_error:
        gt_errs = jnp.zeros((B, C))
    else:
        gt_errs = jnp.linalg.norm(gt_coords - dt_coords, axis=-1)
    if freeze_oks:
        gt_oks = jnp.zeros((B, C))
    else:
        oks_weight_mask = (gt_probs > 0.5) & (gt_annotated > 0.5)
        gt_oks, _ = compute_oks_targets(gt_coords, dt_coords, oks_weight_mask)

    annotated_in = (gt_annotated > 0.5) & (gt_probs > 0.5)

    heatmap_weights = gt_annotated if head_cfg.get("learn_heatmaps_from_zeros", False) else keypoint_weights

    losses: Dict[str, jnp.ndarray] = {}
    heatmap_loss_pxl = loss_modules["keypoint"](dt_heatmaps, gt_heatmaps, heatmap_weights, per_pixel=True)
    losses["loss_kpt"] = heatmap_loss_pxl.mean()
    losses["loss_probability"] = loss_modules["probability"](dt_probs, gt_probs, gt_annotated)

    vis_weights = _balanced_visibility_weights(annotated_in, gt_vis, gt_annotated)
    losses["loss_visibility"] = loss_modules["visibility"](dt_vis, gt_vis, vis_weights)
    losses["loss_oks"] = loss_modules["oks"](dt_oks, gt_oks, annotated_in.astype(jnp.float32))
    losses["loss_error"] = loss_modules["error"](dt_errs, gt_errs, annotated_in.astype(jnp.float32))

    if compute_acc:
        losses["acc_pose"] = _pose_pck_accuracy(
            jax.lax.stop_gradient(dt_heatmaps), gt_heatmaps, keypoint_weights > 0.5
        )
        losses["acc_prob"] = _balanced_binary_accuracy(
            jax.lax.stop_gradient(dt_probs), gt_probs, gt_annotated > 0.5
        )
        losses["acc_vis"] = _balanced_binary_accuracy(jax.lax.stop_gradient(dt_vis), gt_vis, annotated_in)
        mask_f = annotated_in.astype(jnp.float32)
        denom = jnp.maximum(mask_f.sum(), 1.0)
        losses["mae_oks"] = (jnp.abs(jax.lax.stop_gradient(dt_oks) - gt_oks) * mask_f).sum() / denom
        losses["mae_err"] = (jnp.abs(jax.lax.stop_gradient(dt_errs) - gt_errs) * mask_f).sum() / denom
    return losses


def merge_double_heatmaps_device(
    heatmaps1: jnp.ndarray,
    heatmaps2: jnp.ndarray,
    bbox_mask: Optional[jnp.ndarray],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Merge in/out heatmap pairs by window agreement (on device).

    Vectorized equivalent of reference ``DP_head.py:merge_heatmaps:693``
    ("in/all" path): per (sample, keypoint), if the OUT-heatmap's argmax
    falls inside the bbox mask take the IN-heatmap, else the OUT-heatmap.
    ``bbox_mask`` is (B, 1, Hm, Wm) at any resolution (nearest-resized to
    the heatmap grid); None means the whole crop (all ones).

    Returns (merged (B, K, H, W), hout_in (B, K) bool).

    Deviation noted: the reference additionally pads+bilinear-resizes the
    smaller-window heatmap before the select (``DP_head.py:719-744``), but
    because the select keeps one full heatmap per keypoint this only relabels
    which window's geometry the merged map carries; the decode paths here map
    each selected map through its own window affine instead.
    """
    B, K, H, W = heatmaps1.shape
    flat2 = heatmaps2.reshape(B, K, H * W)
    amax = jnp.argmax(flat2, axis=-1)  # (B, K)
    if bbox_mask is None:
        hout_in = jnp.ones((B, K), bool)
    else:
        mask = bbox_mask.reshape(B, 1, bbox_mask.shape[-2], bbox_mask.shape[-1]).astype(jnp.float32)
        mask = jax.image.resize(mask, (B, 1, H, W), method="nearest")
        mask_flat = jnp.broadcast_to(mask.reshape(B, 1, H * W), (B, K, H * W))
        hout_in = jnp.take_along_axis(mask_flat, amax[..., None], axis=-1)[..., 0] > 0.5
    merged = jnp.where(hout_in[..., None, None], heatmaps1, heatmaps2)
    return merged, hout_in


def double_probmap_head_loss(
    outputs: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    loss_modules: Dict[str, Any],
    head_cfg: Dict[str, Any],
    input_size: Tuple[int, int] = (192, 256),
    compute_acc: bool = True,
) -> Dict[str, jnp.ndarray]:
    """DoubleProbMapHead loss dict (reference ``DP_head.py:loss:1293``).

    Split "in/all" (the reference default): the first tower learns keypoints
    inside the tight window (weights = in_image & annotated_in), the second
    learns ALL annotated-in keypoints on the expanded window. GT OKS/error
    targets come from the merged prediction vs the out-window GT maps,
    computed on device (no CPU round-trip).
    """
    dt_heatmaps1 = outputs["heatmaps"]
    dt_heatmaps2 = outputs["out_heatmaps"]
    B, C, H, W = dt_heatmaps1.shape
    dt_probs = outputs["probabilities"].reshape(B, C)
    dt_vis = outputs["visibilities"].reshape(B, C)
    dt_oks = outputs["oks"].reshape(B, C)
    dt_errs = outputs["errors"].reshape(B, C)

    gt_in_heatmaps = batch["heatmaps"].reshape(B, C, H, W)
    gt_out_heatmaps = batch["out_heatmaps"].reshape(B, C, H, W)
    gt_probs = batch["in_image"].astype(jnp.float32).reshape(B, C)
    gt_annotated = batch["annotated"].astype(jnp.float32).reshape(B, C)
    gt_vis = batch["keypoints_visibility"].astype(jnp.float32).reshape(B, C)
    # keypoints_in_image additionally accounts for blackout crops
    # (reference formatting.py:205-209: defaults to in_image, AND-ed with it)
    gt_in_image = batch.get("keypoints_in_image")
    gt_in_image = gt_probs if gt_in_image is None else gt_in_image.astype(jnp.float32).reshape(B, C) * gt_probs

    bbox_mask = batch.get("bbox_mask")
    merged_dt, hout_in = merge_double_heatmaps_device(
        jax.lax.stop_gradient(dt_heatmaps1), jax.lax.stop_gradient(dt_heatmaps2), bbox_mask
    )

    freeze_oks = head_cfg.get("freeze_oks", False)
    freeze_error = head_cfg.get("freeze_error", False)
    need_decode = (not freeze_error) or (not freeze_oks)
    if need_decode:
        gt_coords = _fast_decode_to_input_space(gt_out_heatmaps, input_size)
        dt_coords = _fast_decode_to_input_space(merged_dt, input_size)
    if freeze_error:
        gt_errs = jnp.zeros((B, C))
    else:
        gt_errs = jnp.linalg.norm(gt_coords - dt_coords, axis=-1)
    if freeze_oks:
        gt_oks = jnp.zeros((B, C))
    else:
        oks_weight_mask = (gt_probs > 0.5) & (gt_annotated > 0.5)
        gt_oks, _ = compute_oks_targets(gt_coords, dt_coords, oks_weight_mask)

    annotated_in = (gt_annotated > 0.5) & (gt_probs > 0.5)
    split = head_cfg.get("split_heatmaps_by", "in/all")
    if split == "visibility":
        heatmap1_weights = (gt_vis > 0.5) & annotated_in
        heatmap2_weights = (gt_vis <= 0.5) & annotated_in
    elif split == "in/out":
        heatmap1_weights = (gt_in_image > 0.5) & annotated_in
        heatmap2_weights = (gt_in_image <= 0.5) & annotated_in
    else:  # in/all
        heatmap1_weights = (gt_in_image > 0.5) & annotated_in
        heatmap2_weights = annotated_in

    losses: Dict[str, jnp.ndarray] = {}
    losses["loss_kpt"] = loss_modules["keypoint"](
        dt_heatmaps1, gt_in_heatmaps, heatmap1_weights.astype(jnp.float32)
    )
    losses["loss_kpt2"] = loss_modules["keypoint"](
        dt_heatmaps2, gt_out_heatmaps, heatmap2_weights.astype(jnp.float32)
    )
    losses["loss_probability"] = loss_modules["probability"](dt_probs, gt_probs, gt_annotated)
    losses["loss_visibility"] = loss_modules["visibility"](dt_vis, gt_vis, annotated_in.astype(jnp.float32))
    losses["loss_oks"] = loss_modules["oks"](dt_oks, gt_oks, annotated_in.astype(jnp.float32))
    losses["loss_error"] = loss_modules["error"](dt_errs, gt_errs, annotated_in.astype(jnp.float32))

    if compute_acc:
        losses["acc_pose1"] = _pose_pck_accuracy(
            jax.lax.stop_gradient(dt_heatmaps1), gt_in_heatmaps, heatmap1_weights
        )
        losses["acc_pose2"] = _pose_pck_accuracy(
            jax.lax.stop_gradient(dt_heatmaps2), gt_out_heatmaps, heatmap2_weights
        )
        losses["acc_prob"] = _balanced_binary_accuracy(
            jax.lax.stop_gradient(dt_probs), gt_probs, gt_annotated > 0.5
        )
        losses["acc_vis"] = _balanced_binary_accuracy(jax.lax.stop_gradient(dt_vis), gt_vis, annotated_in)
        mask_f = annotated_in.astype(jnp.float32)
        denom = jnp.maximum(mask_f.sum(), 1.0)
        losses["mae_oks"] = (jnp.abs(jax.lax.stop_gradient(dt_oks) - gt_oks) * mask_f).sum() / denom
        losses["mae_err"] = (jnp.abs(jax.lax.stop_gradient(dt_errs) - gt_errs) * mask_f).sum() / denom
    return losses


def double_probmap_head_predict(
    outputs: Dict[str, jnp.ndarray],
    outputs_flipped: Optional[Dict[str, jnp.ndarray]],
    flip_indices,
    decoder_cfg: Dict[str, Any],
    input_size: Tuple[int, int] = (192, 256),
    shift_heatmap: bool = False,
    freeze_oks: bool = False,
    bbox_mask: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Flip-TTA + paired-window decode + prediction merge, all on device.

    Reference flow ``DP_head.py:predict:947`` -> ``_merge_predictions:1460``:
    decode the in-tower on the tight window and the out-tower on the expanded
    window, then per keypoint keep the in-window prediction iff the
    out-window prediction landed inside the bbox mask. ``bbox_mask`` is
    (B, 1, H_in, W_in) at input resolution; None means "inside the crop".
    """
    heatmaps1 = outputs["heatmaps"]
    heatmaps2 = outputs["out_heatmaps"]
    probs = outputs["probabilities"]
    vis = outputs["visibilities"]
    oks = outputs["oks"]
    errs = outputs["errors"]

    if outputs_flipped is not None:
        hm1_f = flip_heatmaps(
            outputs_flipped["heatmaps"], flip_indices=flip_indices, flip_mode="heatmap", shift_heatmap=shift_heatmap
        )
        hm2_f = flip_heatmaps(
            outputs_flipped["out_heatmaps"], flip_indices=flip_indices, flip_mode="heatmap",
            shift_heatmap=shift_heatmap,
        )
        heatmaps1 = (heatmaps1 + hm1_f) * 0.5
        heatmaps2 = (heatmaps2 + hm2_f) * 0.5
        idx = jnp.asarray(flip_indices)
        probs = (probs + outputs_flipped["probabilities"][:, idx]) * 0.5
        vis = (vis + outputs_flipped["visibilities"][:, idx]) * 0.5
        oks = (oks + outputs_flipped["oks"][:, idx]) * 0.5
        errs = (errs + outputs_flipped["errors"][:, idx]) * 0.5

    B, K, H, W = heatmaps1.shape
    in_pad = float(decoder_cfg.get("in_heatmap_padding", 1.0))
    out_pad = float(decoder_cfg.get("out_heatmap_padding", 1.25))
    input_wh = jnp.asarray(input_size, dtype=jnp.float32)
    input_center = input_wh / 2.0
    hm_wh = jnp.asarray([W - 1, H - 1], dtype=jnp.float32)

    def window_to_input(locs, pad):
        act_wh = input_wh * pad
        act_tl = input_center - act_wh / 2.0
        return locs / hm_wh * act_wh + act_tl

    locs_in, scores_in = heatmap_expected_value_batch(heatmaps1)
    locs_out, scores_out = heatmap_expected_value_batch(heatmaps2)
    kpts_in = window_to_input(locs_in, in_pad)
    kpts_out = window_to_input(locs_out, out_pad)

    # hout_in: does the out-window prediction land inside the bbox mask?
    xi = jnp.round(kpts_out[..., 0]).astype(jnp.int32)
    yi = jnp.round(kpts_out[..., 1]).astype(jnp.int32)
    inside = (xi >= 0) & (xi < input_size[0]) & (yi >= 0) & (yi < input_size[1])
    if bbox_mask is None:
        hout_in = inside
    else:
        mask = bbox_mask.reshape(B, bbox_mask.shape[-2], bbox_mask.shape[-1]).astype(jnp.float32)
        xi_c = jnp.clip(xi, 0, mask.shape[-1] - 1)
        yi_c = jnp.clip(yi, 0, mask.shape[-2] - 1)
        gathered = jax.vmap(lambda m, yy, xx: m[yy, xx])(mask, yi_c, xi_c)
        hout_in = inside & (gathered > 0.5)

    keypoints = jnp.where(hout_in[..., None], kpts_in, kpts_out)
    scores = jnp.where(hout_in, scores_in, scores_out)

    errs = errs / jnp.sqrt(jnp.asarray(H**2 + W**2, dtype=jnp.float32))
    keypoint_scores = oks if not freeze_oks else scores
    return dict(
        keypoints=keypoints,
        keypoint_scores=keypoint_scores,
        keypoints_conf=scores,
        keypoints_probs=probs,
        keypoints_visible=vis,
        keypoints_oks=oks,
        keypoints_error=errs,
        heatmaps=heatmaps1,
        out_heatmaps=heatmaps2,
    )


def simcc_head_loss(
    outputs,
    batch: Dict[str, jnp.ndarray],
    loss_module: Any,
    compute_acc: bool = True,
) -> Dict[str, jnp.ndarray]:
    """SimCC-head loss (reference ``rtmcc_head.py:loss`` / ``simcc_head.py``):
    KL over (x, y) label vectors."""
    pred_x, pred_y = outputs
    gt_x = batch["keypoint_x_labels"]
    gt_y = batch["keypoint_y_labels"]
    weights = batch["keypoint_weights"]
    losses = {"loss_kpt": loss_module((pred_x, pred_y), (gt_x, gt_y), weights)}
    if compute_acc:
        # PCK monitor from SimCC argmax (device version of simcc_pck_accuracy)
        from probpose_code_tpu.ops.decode import simcc_maximum_batch

        dt_locs, _ = simcc_maximum_batch(jax.lax.stop_gradient(pred_x), jax.lax.stop_gradient(pred_y))
        gt_locs, _ = simcc_maximum_batch(gt_x, gt_y)
        Wx = pred_x.shape[-1]
        Wy = pred_y.shape[-1]
        norm = jnp.asarray([Wx, Wy], dtype=jnp.float32) / 10.0 / 2.0  # /split_ratio-free monitor
        dist = jnp.linalg.norm((dt_locs - gt_locs) / norm, axis=-1)
        valid = (weights > 0.5) & (gt_locs[..., 0] >= 0)
        correct = (dist < 0.5) & valid
        losses["acc_pose"] = correct.sum() / jnp.maximum(valid.sum(), 1)
    return losses


def simcc_head_predict(
    outputs,
    outputs_flipped,
    flip_indices,
    simcc_split_ratio: float = 2.0,
) -> Dict[str, jnp.ndarray]:
    """Flip-TTA average + device SimCC decode (reference rtmcc_head.predict)."""
    from probpose_code_tpu.ops.decode import simcc_maximum_batch
    from probpose_code_tpu.ops.tta import flip_vectors

    pred_x, pred_y = outputs
    if outputs_flipped is not None:
        fx, fy = outputs_flipped
        fx, fy = flip_vectors(fx, fy, flip_indices)
        pred_x = (pred_x + fx) * 0.5
        pred_y = (pred_y + fy) * 0.5

    locs, scores = simcc_maximum_batch(pred_x, pred_y)
    keypoints = locs / simcc_split_ratio
    return dict(
        keypoints=keypoints,
        keypoint_scores=scores,
        keypoint_x_labels=pred_x,
        keypoint_y_labels=pred_y,
    )


def regression_head_loss(
    outputs,
    batch: Dict[str, jnp.ndarray],
    loss_module: Any,
    head_type: str,
    module=None,
    variables=None,
) -> Dict[str, jnp.ndarray]:
    """Loss for the coordinate-regression heads.

    RegressionHead: SmoothL1 on normalized labels. RLEHead: the reference
    RLE density loss (``rle_head.py:loss:118`` -> ``RLELoss.forward``) —
    raw sigmas enter the loss, the RealNVP flow (a head submodule, so its
    params train jointly) supplies log_phi of the normalized residuals.
    Integral/DSNT: loss on soft-argmax coords.
    """
    labels = batch["keypoint_labels"]
    weights = batch["keypoint_weights"]
    losses: Dict[str, jnp.ndarray] = {}
    if head_type == "RLEHead":
        pred = outputs
        coords = pred[..., :2]
        sigma_raw = pred[..., 2:4]
        from probpose_code_tpu.models.losses.regression_loss import RLELoss

        rle = loss_module if isinstance(loss_module, RLELoss) else RLELoss(use_target_weight=True)

        def log_phi_fn(error):
            return module.apply(variables, error, method=lambda m, e: m.head.log_phi(e))

        losses["loss_kpt"] = rle(coords, sigma_raw, labels, weights, log_phi_fn=log_phi_fn)
        dt_coords = coords
    elif head_type in ("IntegralRegressionHead", "DSNTHead"):
        coords, heatmaps = outputs
        losses["loss_kpt"] = loss_module(coords, labels, weights)
        dt_coords = coords
    else:
        coords = outputs
        losses["loss_kpt"] = loss_module(coords, labels, weights)
        dt_coords = coords

    # normalized-distance accuracy monitor
    dist = jnp.linalg.norm(jax.lax.stop_gradient(dt_coords) - labels, axis=-1)
    valid = weights > 0.5
    losses["acc_pose"] = ((dist < 0.05) & valid).sum() / jnp.maximum(valid.sum(), 1)
    return losses


def regression_head_predict(outputs, outputs_flipped, flip_indices, input_size, head_type: str):
    """Flip-TTA average + denormalize (reference regression_head.predict)."""
    from probpose_code_tpu.ops.tta import flip_coordinates

    def coords_of(out):
        if head_type in ("IntegralRegressionHead", "DSNTHead"):
            return out[0]
        if head_type == "RLEHead":
            # reference rle_head.predict:98 sigmoids sigmas BEFORE TTA-averaging
            return out.at[..., 2:].set(jax.nn.sigmoid(out[..., 2:]))
        return out

    coords = coords_of(outputs)
    if outputs_flipped is not None:
        coords_f = coords_of(outputs_flipped)
        coords_f = coords_f.at[..., :2].set(
            flip_coordinates(coords_f[..., :2], flip_indices, shift_coords=True, input_size=input_size)
        )
        coords = (coords + coords_f) * 0.5

    if head_type == "RLEHead":
        keypoints = coords[..., :2] * jnp.asarray(input_size, dtype=jnp.float32)
        # sigmas were already sigmoided in coords_of (pre-TTA, like reference)
        scores = (1.0 - coords[..., 2:4]).mean(axis=-1)
    else:
        keypoints = coords * jnp.asarray(input_size, dtype=jnp.float32)
        scores = jnp.ones(coords.shape[:2], jnp.float32)
    return dict(keypoints=keypoints, keypoint_scores=scores)


def internet_head_loss(
    outputs: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
) -> Dict[str, jnp.ndarray]:
    """InternetHead loss (reference ``heatmap_heads/internet_head.py:loss``):
    MSE on the 3D heatmap volumes (weights broadcast over depth), L1 on the
    soft-argmax root depth, BCE on the handedness logits."""
    dt_hm = outputs["heatmaps"]  # (B, K, D, H, W)
    B, K, D, H, W = dt_hm.shape
    gt_hm = batch["heatmaps"].reshape(B, K, D, H, W)
    w = batch["keypoint_weights"].reshape(B, K)[:, :, None, None, None]
    losses = {
        "loss_kpt": (((dt_hm - gt_hm) ** 2) * w).mean(),
    }
    if "root_depth" in batch:
        rw = batch.get("root_depth_weight", jnp.ones((B, 1))).reshape(B, -1)
        losses["loss_rel_root"] = (
            jnp.abs(outputs["root_depth"] - batch["root_depth"].reshape(B, -1)) * rw
        ).mean()
    if "type" in batch:
        logits = outputs["hand_type"]
        target = batch["type"].reshape(B, -1)
        tw = batch.get("type_weight", jnp.ones((B, 1))).reshape(B, -1)
        bce = jnp.clip(logits, 0, None) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        losses["loss_hand_type"] = (bce * tw).mean()
    return losses


def heatmap_head_loss(
    heatmaps: jnp.ndarray,
    batch: Dict[str, jnp.ndarray],
    loss_module: Any,
    compute_acc: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Plain HeatmapHead loss (reference ``heatmap_head.py:loss:270``)."""
    losses = {
        "loss_kpt": loss_module(heatmaps, batch["heatmaps"], batch["keypoint_weights"]),
    }
    if compute_acc:
        losses["acc_pose"] = _pose_pck_accuracy(
            jax.lax.stop_gradient(heatmaps), batch["heatmaps"], batch["keypoint_weights"] > 0.5
        )
    return losses


# --------------------------------------------------------------------------
# Predict program pieces
# --------------------------------------------------------------------------


def probmap_head_predict(
    outputs: Dict[str, jnp.ndarray],
    outputs_flipped: Optional[Dict[str, jnp.ndarray]],
    flip_indices,
    input_size: Tuple[int, int] = (192, 256),
    shift_heatmap: bool = False,
    freeze_oks: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Flip-TTA average + on-device expected-OKS decode
    (reference ``probmap_head.py:predict:715-804``)."""
    heatmaps = outputs["heatmaps"]
    probs = outputs["probabilities"]
    vis = outputs["visibilities"]
    oks = outputs["oks"]
    errs = outputs["errors"]

    if outputs_flipped is not None:
        hm_f = flip_heatmaps(
            outputs_flipped["heatmaps"], flip_indices=flip_indices, flip_mode="heatmap", shift_heatmap=shift_heatmap
        )
        heatmaps = (heatmaps + hm_f) * 0.5
        idx = jnp.asarray(flip_indices)
        probs = (probs + outputs_flipped["probabilities"][:, idx]) * 0.5
        vis = (vis + outputs_flipped["visibilities"][:, idx]) * 0.5
        oks = (oks + outputs_flipped["oks"][:, idx]) * 0.5
        errs = (errs + outputs_flipped["errors"][:, idx]) * 0.5

    B, K, H, W = heatmaps.shape
    locs, scores = heatmap_expected_value_batch(heatmaps)
    scale = jnp.asarray([input_size[0] / (W - 1), input_size[1] / (H - 1)], dtype=jnp.float32)
    keypoints = locs * scale

    errs = errs / jnp.sqrt(jnp.asarray(H**2 + W**2, dtype=jnp.float32))

    keypoint_scores = oks if not freeze_oks else scores
    return dict(
        keypoints=keypoints,
        keypoint_scores=keypoint_scores,
        keypoints_conf=scores,
        keypoints_probs=probs,
        keypoints_visible=vis,
        keypoints_oks=oks,
        keypoints_error=errs,
        heatmaps=heatmaps,
    )
