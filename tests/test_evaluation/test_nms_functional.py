"""OKS / soft / nearby-joints NMS (reference ``evaluation/functional/nms.py``)."""

import numpy as np


def _inst(xy, score, K=17, area=None, spread=10.0):
    rng = np.random.RandomState(0)
    kpts = np.asarray(xy, np.float32) + rng.rand(K, 2).astype(np.float32) * spread
    kpts3 = np.concatenate([kpts, np.ones((K, 1), np.float32)], 1)
    return dict(keypoints=kpts3, score=float(score),
                area=float(area if area is not None else spread * spread))


def test_oks_nms_suppresses_duplicates_keeps_distant():
    from probpose_code_tpu.evaluation.functional.nms import oks_nms

    a = _inst((10, 10), 0.9)
    b = dict(a, score=0.8)  # exact duplicate of a, lower score
    c = _inst((500, 500), 0.7)
    keep = oks_nms([a, b, c], thr=0.9)
    assert list(keep) == [0, 2]


def test_oks_nms_score_per_joint():
    from probpose_code_tpu.evaluation.functional.nms import oks_nms

    a = _inst((10, 10), 0.0)
    a["score"] = np.full(17, 0.9)  # per-joint score array (reference convention)
    b = _inst((300, 300), 0.0)
    b["score"] = np.full(17, 0.5)
    keep = oks_nms([b, a], thr=0.9, score_per_joint=True)
    assert keep[0] == 1  # a has the higher mean joint score


def test_soft_oks_nms_rescoring_keeps_all_but_reorders():
    from probpose_code_tpu.evaluation.functional.nms import soft_oks_nms

    a = _inst((10, 10), 0.9)
    b = dict(a, score=0.85)  # heavy overlap: rescored down
    c = _inst((500, 500), 0.6)
    keep = soft_oks_nms([a, b, c], thr=0.1, max_dets=3)
    assert keep[0] == 0
    assert set(keep.tolist()) == {0, 1, 2}
    assert keep.tolist().index(2) < keep.tolist().index(1)  # c outranks rescored b


def test_nearby_joints_nms():
    from probpose_code_tpu.evaluation.functional.nms import nearby_joints_nms

    a = _inst((10, 10), 0.9)
    b = dict(_inst((10, 10), 0.95), keypoints=a["keypoints"] + 0.01)
    c = _inst((500, 500), 0.7)
    keep = nearby_joints_nms([a, b, c], dist_thr=0.05, num_nearby_joints_thr=8)
    assert sorted(keep) == [1, 2]  # b beats its near-duplicate a

    assert nearby_joints_nms([], dist_thr=0.05) == []


def test_bbox_nms_and_overlaps():
    from probpose_code_tpu.evaluation.functional.nms import bbox_nms_np, bbox_overlaps_np

    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = bbox_nms_np(boxes, scores, threshold=0.5)
    assert list(keep) == [0, 2]
    iou = bbox_overlaps_np(boxes[:1], boxes)
    assert iou[0, 0] == 1.0 and iou[0, 2] == 0.0
