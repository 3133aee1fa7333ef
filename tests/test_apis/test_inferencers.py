"""Inferencer + tracking tests."""

import numpy as np
import pytest

from probpose_code_tpu.apis.inference_tracking import _track_by_iou, _track_by_oks
from probpose_code_tpu.config import Config
from probpose_code_tpu.structures import InstanceData


@pytest.fixture(scope="module")
def pose2d_cfg():
    from tests.test_models.test_probpose_model import TINY_PROBPOSE_CFG

    return Config.fromdict(dict(model=TINY_PROBPOSE_CFG))


def test_pose2d_inferencer_folder(pose2d_cfg, tmp_path):
    import cv2

    from probpose_code_tpu.apis.inferencers import Pose2DInferencer

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        cv2.imwrite(str(img_dir / f"img{i}.jpg"), (rng.rand(240, 320, 3) * 255).astype(np.uint8))

    inferencer = Pose2DInferencer(pose2d_cfg)
    outputs = inferencer(
        str(img_dir),
        vis_out_dir=str(tmp_path / "vis"),
        pred_out_dir=str(tmp_path / "preds"),
    )
    assert len(outputs) == 2
    assert (tmp_path / "vis" / "img0.jpg").exists()
    assert (tmp_path / "preds" / "img0.json").exists()
    inst = outputs[0]["predictions"].pred_instances
    assert np.asarray(inst.keypoints).shape[-2:] == (17, 2)


def test_pose2d_inferencer_with_bboxes(pose2d_cfg):
    from probpose_code_tpu.apis.inferencers import Pose2DInferencer

    rng = np.random.RandomState(1)
    img = (rng.rand(300, 400, 3) * 255).astype(np.uint8)
    inferencer = Pose2DInferencer(pose2d_cfg)
    outputs = inferencer(img, bboxes={"*": np.array([[10, 10, 150, 250], [200, 20, 380, 280]])})
    inst = outputs[0]["predictions"].pred_instances
    assert np.asarray(inst.keypoints).shape[0] <= 2  # may be NMS-merged


def _make_result(bbox, kpts, track_id=None):
    r = InstanceData()
    r.set_field(np.asarray(bbox, np.float32)[None], "bboxes")
    r.set_field(np.asarray(kpts, np.float32)[None], "keypoints")
    r.set_field(np.ones((1, len(kpts)), np.float32), "keypoint_scores")
    if track_id is not None:
        r.set_field(track_id, "track_id")
    return r


def test_track_by_iou():
    rng = np.random.RandomState(0)
    kpts = rng.rand(17, 2) * 100
    last = [_make_result([0, 0, 100, 100], kpts, track_id=7)]
    cur = _make_result([5, 5, 105, 105], kpts)
    track_id, remaining, iou = _track_by_iou(cur, last, thr=0.3)
    assert track_id == 7 and len(remaining) == 0 and iou > 0.7

    last = [_make_result([0, 0, 100, 100], kpts, track_id=7)]
    far = _make_result([500, 500, 600, 600], kpts + 500)
    track_id, remaining, iou = _track_by_iou(far, last, thr=0.3)
    assert track_id == -1 and len(remaining) == 1


def test_track_by_oks():
    rng = np.random.RandomState(0)
    kpts = rng.rand(17, 2) * 100
    last = [_make_result([0, 0, 100, 100], kpts, track_id=3)]
    cur = _make_result([0, 0, 100, 100], kpts + 1.0)
    track_id, remaining, oks = _track_by_oks(cur, last, thr=0.3)
    assert track_id == 3 and oks > 0.5


def test_pose2d_inferencer_webcam_input(pose2d_cfg, monkeypatch, tmp_path):
    """Webcam streaming input (reference base_mmpose_inferencer.py:216-276):
    "webcam:N" enumerates frames from cv2.VideoCapture(N)."""
    import cv2

    from probpose_code_tpu.apis.inferencers import Pose2DInferencer, _enumerate_inputs

    rng = np.random.RandomState(2)
    frames = [(rng.rand(240, 320, 3) * 255).astype(np.uint8) for _ in range(3)]

    class FakeCapture:
        def __init__(self, cam_id):
            assert cam_id == 1
            self._i = 0

        def isOpened(self):
            return True

        def read(self):
            if self._i >= len(frames):
                return False, None
            self._i += 1
            return True, frames[self._i - 1]

        def release(self):
            pass

    monkeypatch.setattr(cv2, "VideoCapture", FakeCapture)

    enumerated = list(_enumerate_inputs("webcam:1"))
    assert [n for n, _ in enumerated] == ["webcam_000000", "webcam_000001", "webcam_000002"]

    inferencer = Pose2DInferencer(pose2d_cfg)
    outputs = inferencer("webcam:1", pred_out_dir=str(tmp_path / "preds"))
    assert len(outputs) == 3
    inst = outputs[0]["predictions"].pred_instances
    assert np.asarray(inst.keypoints).shape[-2:] == (17, 2)


def test_webcam_input_bad_spec():
    from probpose_code_tpu.apis.inferencers import _webcam_inputs

    with pytest.raises(ValueError):
        list(_webcam_inputs("webcam:abc"))


def test_pose2d_inferencer_routes_bottomup_models(tmp_path):
    """A whole-image (bottomup) model must NOT be forced through the
    single-crop topdown path (reference pose2d_inferencer data_mode
    routing)."""
    import cv2
    import numpy as np

    from probpose_code_tpu.apis import Pose2DInferencer

    img_path = str(tmp_path / "img.jpg")
    cv2.imwrite(img_path, (np.random.RandomState(0).rand(96, 96, 3) * 255).astype(np.uint8))

    codec = dict(type="SPR", input_size=(64, 64), heatmap_size=(2, 2), sigma=(1, 1),
                 generate_keypoint_heatmaps=True)
    cfg = dict(model=dict(
        type="BottomupPoseEstimator",
        data_preprocessor=dict(type="PoseDataPreprocessor", mean=[0, 0, 0], std=[1, 1, 1]),
        backbone=dict(type="ResNet", depth=18),
        head=dict(type="DEKRHead", in_channels=512, num_keypoints=17, decoder=codec),
        test_cfg=dict(flip_test=False, nms_dist_thr=0.05),
    ))
    inf = Pose2DInferencer(cfg)
    res = inf(img_path)
    assert len(res) == 1 and "predictions" in res[0]
