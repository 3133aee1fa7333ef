"""Pose / bbox NMS (host NumPy + a jnp variant for one-stage heads).

Parity targets in reference ``mmpose/evaluation/functional/nms.py``:
nms:16, oks_iou:58 (vectorized here), oks_nms:119, soft_oks_nms:198
(gaussian rescoring), nearby_joints_nms:262, nms_torch:337 (reimplemented as
``bbox_nms_jnp`` for device use).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from probpose_code_tpu.codecs.utils.oks_map import COCO_KPT_SIGMAS


def nms(dets: np.ndarray, thr: float) -> List[int]:
    """Greedy IoU NMS over [[x1, y1, x2, y2, score]] rows."""
    if len(dets) == 0:
        return []
    x1, y1, x2, y2, scores = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3], dets[:, 4]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep: List[int] = []
    while len(order) > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        inter = np.maximum(0.0, xx2 - xx1 + 1) * np.maximum(0.0, yy2 - yy1 + 1)
        ovr = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][ovr <= thr]
    return keep


def oks_iou(
    g: np.ndarray,
    d: np.ndarray,
    a_g: float,
    a_d: np.ndarray,
    sigmas: Optional[np.ndarray] = None,
    vis_thr: Optional[float] = None,
) -> np.ndarray:
    """OKS between instance g (K*3,) and instances d (N, K*3), vectorized."""
    if sigmas is None:
        sigmas = COCO_KPT_SIGMAS
    vars_ = (np.asarray(sigmas) * 2) ** 2
    xg, yg, vg = g[0::3], g[1::3], g[2::3]
    if len(d) == 0:  # the reference's per-instance loop is a no-op here
        return np.zeros(0, dtype=np.float64)
    d = np.asarray(d).reshape(len(d), -1)
    xd, yd, vd = d[:, 0::3], d[:, 1::3], d[:, 2::3]

    dx = xd - xg[None]
    dy = yd - yg[None]
    denom = ((a_g + np.asarray(a_d)) / 2 + np.spacing(1))[:, None]
    e = (dx**2 + dy**2) / vars_[None] / denom / 2  # (N, K)

    if vis_thr is not None:
        valid = (vg[None] > vis_thr) & (vd > vis_thr)
        n_valid = valid.sum(axis=1)
        s = np.where(valid, np.exp(-e), 0.0).sum(axis=1)
        ious = np.where(n_valid > 0, s / np.maximum(n_valid, 1), 0.0)
    else:
        ious = np.exp(-e).mean(axis=1)
    return ious.astype(np.float32)


def _db_scores(kpts_db: List[dict], score_per_joint: bool) -> np.ndarray:
    if score_per_joint:
        return np.array([k["score"].mean() for k in kpts_db])
    return np.array([k["score"] for k in kpts_db])


def oks_nms(
    kpts_db: List[dict],
    thr: float,
    sigmas: Optional[np.ndarray] = None,
    vis_thr: Optional[float] = None,
    score_per_joint: bool = False,
):
    """Greedy OKS NMS; retain overlap < thr."""
    if len(kpts_db) == 0:
        return []
    scores = _db_scores(kpts_db, score_per_joint)
    kpts = np.array([np.asarray(k["keypoints"]).flatten() for k in kpts_db])
    areas = np.array([k["area"] for k in kpts_db])

    order = scores.argsort()[::-1]
    keep: List[int] = []
    while len(order) > 0:
        i = order[0]
        keep.append(int(i))
        if len(order) == 1:
            break
        ious = oks_iou(kpts[i], kpts[order[1:]], areas[i], areas[order[1:]], sigmas, vis_thr)
        order = order[1:][ious <= thr]
    return np.array(keep)


def soft_oks_nms(
    kpts_db: List[dict],
    thr: float,
    max_dets: int = 20,
    sigmas: Optional[np.ndarray] = None,
    vis_thr: Optional[float] = None,
    score_per_joint: bool = False,
):
    """Soft NMS with gaussian OKS rescoring."""
    if len(kpts_db) == 0:
        return []
    scores = _db_scores(kpts_db, score_per_joint)
    kpts = np.array([np.asarray(k["keypoints"]).flatten() for k in kpts_db])
    areas = np.array([k["area"] for k in kpts_db])

    order = scores.argsort()[::-1]
    scores = scores[order]
    keep = []
    while len(order) > 0 and len(keep) < max_dets:
        i = order[0]
        ious = oks_iou(kpts[i], kpts[order[1:]], areas[i], areas[order[1:]], sigmas, vis_thr)
        order = order[1:]
        scores = scores[1:] * np.exp(-(ious**2) / thr)  # gaussian rescoring
        resort = scores.argsort()[::-1]
        order = order[resort]
        scores = scores[resort]
        keep.append(int(i))
    return np.array(keep, dtype=np.intp)


def nearby_joints_nms(
    kpts_db: List[dict],
    dist_thr: float = 0.05,
    num_nearby_joints_thr: Optional[int] = None,
    score_per_joint: bool = False,
    max_dets: int = 30,
):
    """Suppress instances sharing many close joints (DEKR-style)."""
    assert dist_thr > 0
    if len(kpts_db) == 0:
        return []
    scores = _db_scores(kpts_db, score_per_joint)
    kpts = np.array([k["keypoints"] for k in kpts_db])

    num_people, num_joints, _ = kpts.shape
    if num_nearby_joints_thr is None:
        num_nearby_joints_thr = num_joints // 2
    assert num_nearby_joints_thr < num_joints

    pose_area = kpts.max(axis=1) - kpts.min(axis=1)
    pose_area = np.sqrt((pose_area**2).sum(axis=1)).reshape(num_people, 1, 1)
    close_dist_thr = np.tile(pose_area, (1, num_people, num_joints)) * dist_thr

    instance_dist = np.sqrt(((kpts[:, None] - kpts[None]) ** 2).sum(axis=3))
    close_instance = (instance_dist < close_dist_thr).sum(2) > num_nearby_joints_thr

    ignored, keep_pose_inds = set(), []
    for i in np.argsort(scores)[::-1]:
        if i in ignored:
            continue
        group = close_instance[i].nonzero()[0]
        best = group[np.argmax(scores[group])]
        if best not in ignored:
            keep_pose_inds.append(int(best))
            ignored |= set(group.tolist())

    if max_dets > 0 and len(keep_pose_inds) > max_dets:
        sub = np.argsort(scores[keep_pose_inds])[-1:-max_dets - 1:-1]
        keep_pose_inds = [keep_pose_inds[i] for i in sub]
    return keep_pose_inds


def bbox_overlaps_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise IoU between (N, 4) and (M, 4) xyxy boxes."""
    area_a = np.maximum(0, a[:, 2] - a[:, 0]) * np.maximum(0, a[:, 3] - a[:, 1])
    area_b = np.maximum(0, b[:, 2] - b[:, 0]) * np.maximum(0, b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.maximum(0, rb - lt)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_a[:, None] + area_b[None] - inter + np.spacing(1))


def bbox_nms_np(bboxes: np.ndarray, scores: np.ndarray, threshold: float = 0.65):
    """Greedy bbox NMS returning kept indices (device variant of nms_torch)."""
    order = np.argsort(-scores)
    keep = []
    while len(order):
        i = order[0]
        keep.append(int(i))
        if len(order) == 1:
            break
        ious = bbox_overlaps_np(bboxes[i:i + 1], bboxes[order[1:]])[0]
        order = order[1:][ious <= threshold]
    return np.array(keep)
