"""Native poseval-protocol (PoseTrack18) per-joint AP tests."""

import numpy as np

from probpose_code_tpu.evaluation.functional.poseval import (
    STAT_NAMES,
    _head_norm,
    _match_frame,
    evaluate_ap,
)

K = 17


def _pose(xy, vis=2.0, head=(0, 0, 20, 20)):
    kp = np.zeros((K, 3), np.float64)
    kp[:, :2] = xy
    kp[:, 2] = vis
    return dict(keypoints=kp.reshape(-1).tolist(), bbox_head=list(head))


def _pred(xy, score=0.9):
    kp = np.zeros((K, 3), np.float64)
    kp[:, :2] = xy
    kp[:, 2] = score
    return dict(keypoints=kp.reshape(-1).tolist(), scores=[score] * K)


def _grid(offset=0.0):
    xy = np.stack([np.arange(K) * 30.0 + 100, np.full(K, 50.0)], axis=-1)
    return xy + offset


def test_perfect_predictions_score_100():
    gt = {1: [_pose(_grid())], 2: [_pose(_grid())]}
    pred = {1: [_pred(_grid())], 2: [_pred(_grid())]}
    stats = dict(evaluate_ap(gt, pred))
    assert list(dict(evaluate_ap(gt, pred))) == STAT_NAMES
    for name in STAT_NAMES:
        assert stats[name] == 100.0, (name, stats[name])


def test_far_predictions_score_zero():
    gt = {1: [_pose(_grid())]}
    pred = {1: [_pred(_grid(offset=500.0))]}
    stats = dict(evaluate_ap(gt, pred))
    assert stats["AP"] == 0.0


def test_half_recall():
    """Two frames, only one predicted -> AP = 0.5 per joint."""
    gt = {1: [_pose(_grid())], 2: [_pose(_grid())]}
    pred = {1: [_pred(_grid())]}
    stats = dict(evaluate_ap(gt, pred))
    assert abs(stats["AP"] - 50.0) < 1e-6


def test_pckh_threshold_uses_head_size():
    # head diag 0.6*hypot(20,20) ~ 16.97; offset 5 < 0.5*norm -> correct,
    # offset 20 > 0.5*norm -> incorrect
    gt = {1: [_pose(_grid(), head=(0, 0, 20, 20))]}
    close = dict(evaluate_ap(gt, {1: [_pred(_grid(offset=5.0))]}))
    far = dict(evaluate_ap(gt, {1: [_pred(_grid(offset=20.0))]}))
    assert close["AP"] == 100.0
    assert far["AP"] == 0.0


def test_match_frame_prefers_correct_pose():
    gt = [_pose(_grid()), _pose(_grid() + 300.0)]
    preds = [_pred(_grid() + 300.0), _pred(_grid())]
    matches = _match_frame(gt, preds)
    assert sorted(matches) == [(0, 1), (1, 0)]


def test_head_norm_fallbacks():
    p = _pose(_grid(), head=(0, 0, 30, 40))
    assert abs(_head_norm(p) - 0.6 * 50.0) < 1e-9
    p2 = _pose(_grid())
    p2.pop("bbox_head")
    p2["bbox"] = [0, 0, 30, 40]
    # keypoint-segment fallback first (head_top/bottom 30px apart here)
    assert _head_norm(p2) > 0


def test_unscored_joints_are_skipped():
    gt = {1: [_pose(_grid())]}
    pr = _pred(_grid())
    kp = np.asarray(pr["keypoints"], np.float64).reshape(K, 3)
    pr["scores"] = [0.0] * 5 + [0.9] * (K - 5)  # first 5 joints unpredicted
    pr["keypoints"] = kp.reshape(-1).tolist()
    stats = dict(evaluate_ap(gt, {1: [pr]}))
    # head group (0,1,2) has no scored detections -> AP 0 for those joints
    assert stats["Head AP"] == 0.0
    assert stats["Wri AP"] == 100.0
