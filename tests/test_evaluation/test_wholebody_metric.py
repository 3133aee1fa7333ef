"""CocoWholeBodyMetric end-to-end on synthetic 133-kpt data + partition metric."""

import json

import numpy as np
import pytest

from probpose_code_tpu.datasets.metainfo import parse_pose_metainfo
from probpose_code_tpu.evaluation import CocoWholeBodyMetric, KeypointPartitionMetric
from probpose_code_tpu.structures import InstanceData, PoseDataSample

CUTS = [17, 6, 68, 21, 21]


@pytest.fixture(scope="module")
def wb_gt_file(tmp_path_factory):
    rng = np.random.RandomState(0)
    images, annotations = [], []
    aid = 1
    for img_id in range(1, 5):
        images.append(dict(id=img_id, width=640, height=480))
        for _ in range(2):
            x0, y0 = rng.rand(2) * [300, 200]
            w, h = 150 + rng.rand() * 150, 150 + rng.rand() * 150
            parts = []
            for n in CUTS:
                k = np.stack([x0 + rng.rand(n) * w, y0 + rng.rand(n) * h,
                              np.full(n, 2.0)], axis=-1)
                parts.append(k.reshape(-1))
            body, foot, face, lh, rh = parts
            annotations.append(dict(
                id=aid, image_id=img_id, category_id=1, bbox=[x0, y0, w, h],
                area=w * h, iscrowd=0, num_keypoints=17,
                keypoints=body.tolist(), foot_kpts=foot.tolist(), face_kpts=face.tolist(),
                lefthand_kpts=lh.tolist(), righthand_kpts=rh.tolist(),
            ))
            aid += 1
    path = tmp_path_factory.mktemp("wb") / "wb_gt.json"
    path.write_text(json.dumps(dict(
        info={}, licenses=None, images=images, annotations=annotations,
        categories=[dict(id=1, name="person")],
    )))
    return str(path)


def test_wholebody_metric(wb_gt_file, tmp_path):
    metric = CocoWholeBodyMetric(ann_file=wb_gt_file, score_mode="bbox",
                                 nms_mode="none", outfile_prefix=str(tmp_path / "wb"))
    metric.dataset_meta = parse_pose_metainfo(dict(from_file="coco_wholebody"))
    gt = json.loads(open(wb_gt_file).read())
    rng = np.random.RandomState(1)
    for ann in gt["annotations"]:
        full = np.concatenate([
            np.array(ann["keypoints"]).reshape(-1, 3),
            np.array(ann["foot_kpts"]).reshape(-1, 3),
            np.array(ann["face_kpts"]).reshape(-1, 3),
            np.array(ann["lefthand_kpts"]).reshape(-1, 3),
            np.array(ann["righthand_kpts"]).reshape(-1, 3),
        ])
        pred_xy = full[:, :2] + rng.randn(133, 2) * 1.0
        sample = PoseDataSample()
        sample.set_metainfo(dict(id=ann["id"], img_id=ann["image_id"], category_id=1))
        pred = InstanceData()
        pred.set_field(pred_xy[None].astype(np.float32), "keypoints")
        pred.set_field(np.full((1, 133), 0.95, np.float32), "keypoint_scores")
        sample.pred_instances = pred
        gti = InstanceData()
        gti.set_field(np.ones(1, np.float32), "bbox_scores")
        sample.gt_instances = gti
        metric.process(None, [sample])
    res = metric.evaluate(len(gt["annotations"]))
    keys = list(res)
    assert any("body_AP" in k for k in keys) and any(k.endswith("AP") for k in keys)
    body_ap = [v for k, v in res.items() if "body_AP" in k and "50" not in k and ".75" not in k][0]
    whole_ap = [v for k, v in res.items() if k.split("/")[-1] == "AP"][0]
    assert body_ap > 0.7, res
    assert whole_ap > 0.7, res


def test_partition_metric_routes_keypoints():
    m = KeypointPartitionMetric(metric=dict(type="PCKAccuracy", thr=0.5),
                                partitions=dict(head=[0, 1], rest=[2, 3, 4]))
    m.dataset_meta = dict(num_keypoints=5, sigmas=np.ones(5) * 0.05)
    rng = np.random.RandomState(0)
    gt_k = rng.rand(1, 5, 2) * 10
    pred_k = gt_k.copy()
    pred_k[0, 2:] += 100.0  # rest partition entirely wrong
    sample = dict(
        pred_instances=dict(keypoints=pred_k),
        gt_instances=dict(keypoints=gt_k, keypoints_visible=np.ones((1, 5)),
                          bboxes=np.array([[0, 0, 10, 10]]), bbox_scales=np.array([[10, 10]])),
    )
    m.process(None, [sample])
    res = m.evaluate(1)
    head = [v for k, v in res.items() if k.startswith("head")][0]
    rest = [v for k, v in res.items() if k.startswith("rest")][0]
    assert head == 1.0 and rest == 0.0, res
