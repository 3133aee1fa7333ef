"""IoU / OKS frame-to-frame tracking (reference ``apis/inference_tracking.py``)."""

import numpy as np


class _Res:
    def __init__(self, bbox=None, kpts=None, scores=None, track_id=None):
        if bbox is not None:
            self.bboxes = np.asarray(bbox, np.float32)[None]
        if kpts is not None:
            self.keypoints = np.asarray(kpts, np.float32)[None]
            self.keypoint_scores = np.asarray(scores, np.float32)[None]
        if track_id is not None:
            self.track_id = track_id


def test_track_by_iou_matches_and_consumes():
    from probpose_code_tpu.apis.inference_tracking import _track_by_iou

    last = [_Res(bbox=[0, 0, 10, 10], track_id=7), _Res(bbox=[100, 100, 120, 130], track_id=8)]
    tid, rest, iou = _track_by_iou(_Res(bbox=[1, 1, 11, 11]), last, thr=0.3)
    assert tid == 7 and iou > 0.3
    assert len(rest) == 1 and rest[0].track_id == 8

    tid, rest, _ = _track_by_iou(_Res(bbox=[500, 500, 510, 510]), rest, thr=0.3)
    assert tid == -1 and len(rest) == 1  # no match leaves the pool intact


def test_track_by_oks_matches_nearest_pose():
    from probpose_code_tpu.apis.inference_tracking import _track_by_oks

    rng = np.random.RandomState(0)
    kpts = rng.rand(17, 2) * 80
    sc = np.ones(17)
    last = [
        _Res(kpts=kpts + 0.5, scores=sc, track_id=3),
        _Res(kpts=kpts + 300.0, scores=sc, track_id=4),
    ]
    tid, rest, oks = _track_by_oks(_Res(kpts=kpts, scores=sc), last, thr=0.3)
    assert tid == 3 and oks > 0.3
    assert [r.track_id for r in rest] == [4]
