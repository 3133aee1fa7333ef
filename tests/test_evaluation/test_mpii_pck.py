"""MpiiPCKAccuracy official protocol (reference
``keypoint_2d_metrics.py:290-355``)."""

import numpy as np
import pytest

from probpose_code_tpu.evaluation import MpiiPCKAccuracy


def _sample(pred, gt, head_size, mask=None):
    return dict(
        pred_instances=dict(keypoints=pred),
        gt_instances=dict(
            keypoints=gt,
            keypoints_visible=np.ones(gt.shape[:2], np.float32) if mask is None else mask,
            head_size=np.full((gt.shape[0], 1), head_size, np.float32),
        ),
    )


def test_exact_predictions_need_matlab_offset():
    """GT is 1-based (MATLAB); a prediction equal to gt-1 is exact."""
    rng = np.random.RandomState(0)
    gt = (rng.rand(4, 16, 2) * 200 + 50).astype(np.float32)
    m = MpiiPCKAccuracy()
    m.process(None, [_sample(gt - 1.0, gt, head_size=60.0)])
    res = m.evaluate(4)
    assert res["mpii/PCK"] == pytest.approx(100.0)
    assert res["mpii/Head PCK"] == pytest.approx(100.0)
    for part in ("Shoulder", "Elbow", "Wrist", "Hip", "Knee", "Ankle"):
        assert res[f"mpii/{part} PCK"] == pytest.approx(100.0)
    assert res["mpii/PCK@0.1"] == pytest.approx(100.0)


def test_pelvis_thorax_excluded_from_mean():
    """Joints 6/7 are masked out of the official mean (reference :321-322):
    arbitrarily bad pelvis/thorax predictions must not move 'PCK'."""
    rng = np.random.RandomState(1)
    gt = (rng.rand(6, 16, 2) * 200 + 50).astype(np.float32)
    pred = gt - 1.0
    pred[:, 6:8] += 1e4  # destroy pelvis + thorax
    m = MpiiPCKAccuracy()
    m.process(None, [_sample(pred, gt, head_size=60.0)])
    assert m.evaluate(6)["mpii/PCK"] == pytest.approx(100.0)


def test_partial_miss_weighted_by_joint_counts():
    gt = np.tile(np.arange(32, dtype=np.float32).reshape(1, 16, 2) * 10 + 100, (2, 1, 1))
    pred = gt - 1.0
    pred[0, 0] += 1e4  # one right-ankle miss out of 2 samples
    m = MpiiPCKAccuracy()
    m.process(None, [_sample(pred, gt, head_size=60.0)])
    res = m.evaluate(2)
    # ankle = mean(PCKh[5], PCKh[0]) = mean(100, 50) = 75
    assert res["mpii/Ankle PCK"] == pytest.approx(75.0)
    # weighted mean over 14 kept joints, each with 2 visible instances
    assert res["mpii/PCK"] == pytest.approx(100.0 - 100.0 / 28)
