"""MPJPE / SimpleMPJPE metric behavior (reference
``keypoint_3d_metrics.py`` / ``simple_keypoint_3d_metrics.py``)."""

import numpy as np
import pytest

from probpose_code_tpu.evaluation import MPJPE, SimpleMPJPE


def _sample(pred, gt, mask=None, img_path=None):
    s = dict(
        pred_instances=dict(keypoints=pred),
        gt_instances=dict(
            lifting_target=gt,
            lifting_target_visible=(np.ones(gt.shape[:-1], np.float32)
                                    if mask is None else mask),
        ),
    )
    if img_path is not None:
        s["target_img_path"] = [img_path]
    return s


def test_simple_mpjpe_translation():
    rng = np.random.RandomState(0)
    gt = rng.rand(4, 17, 3).astype(np.float32)
    pred = gt + np.array([0.03, 0.04, 0.0], np.float32)  # 50 mm offset
    m = SimpleMPJPE(mode="mpjpe")
    m.process(None, [_sample(pred, gt)])
    res = m.evaluate(len(pred))
    assert res["mpjpe/MPJPE"] == pytest.approx(0.05, abs=1e-6)


def test_pmpjpe_invariant_to_similarity_transform():
    rng = np.random.RandomState(1)
    gt = rng.rand(3, 17, 3).astype(np.float64)
    theta = 0.7
    R = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0],
                  [0, 0, 1]])
    pred = 1.7 * gt @ R.T + np.array([0.5, -0.2, 0.1])
    m = SimpleMPJPE(mode="p-mpjpe")
    m.process(None, [_sample(pred, gt)])
    assert m.evaluate(3)["mpjpe/P-MPJPE"] == pytest.approx(0.0, abs=1e-8)


def test_nmpjpe_scale_alignment():
    rng = np.random.RandomState(2)
    gt = rng.rand(3, 17, 3)
    m = SimpleMPJPE(mode="n-mpjpe")
    m.process(None, [_sample(2.0 * gt, gt)])
    assert m.evaluate(3)["mpjpe/N-MPJPE"] == pytest.approx(0.0, abs=1e-8)


def test_mpjpe_action_breakdown_and_skip_list():
    rng = np.random.RandomState(3)
    gt = rng.rand(2, 17, 3).astype(np.float32)
    walk = _sample(gt + np.array([0.01, 0, 0], np.float32), gt, img_path="S1_Walking_1.54138969_000001.jpg")
    eat = _sample(gt + np.array([0.02, 0, 0], np.float32), gt, img_path="S5_Eating.60457274_000011.jpg")
    skipped = _sample(gt + 9.0, gt, img_path="S9_Greeting.54138969_000100.jpg")
    m = MPJPE(mode="mpjpe", skip_list=["S9_Greeting"])
    m.process(None, [walk, eat, skipped])
    res = m.evaluate(4)
    # overall excludes the skipped subject-action stem
    assert res["mpjpe/MPJPE"] == pytest.approx(0.015, abs=1e-5)
    # per-action categories drop the `_1` trial suffix (reference :119-121)
    assert res["mpjpe/MPJPE_Walking"] == pytest.approx(0.01, abs=1e-6)
    assert res["mpjpe/MPJPE_Eating"] == pytest.approx(0.02, abs=1e-6)
    assert not any("Greeting" in k for k in res)


def test_mpjpe_visibility_mask():
    gt = np.zeros((1, 4, 3), np.float32)
    pred = gt.copy()
    pred[0, 0] = [1.0, 0, 0]  # huge error on a masked-out joint
    mask = np.ones((1, 4), np.float32)
    mask[0, 0] = 0
    m = SimpleMPJPE()
    m.process(None, [_sample(pred, gt, mask=mask)])
    assert m.evaluate(1)["mpjpe/MPJPE"] == pytest.approx(0.0, abs=1e-8)
