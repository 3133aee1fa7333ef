"""CocoMetric end-to-end: synthetic GT + near-perfect predictions -> high AP."""

import json
import pathlib

import numpy as np
import pytest

from probpose_code_tpu.datasets.metainfo import parse_pose_metainfo
from probpose_code_tpu.evaluation import CocoMetric
from probpose_code_tpu.structures import InstanceData, PoseDataSample

GOLDEN = pathlib.Path(__file__).parent.parent / "golden"


@pytest.fixture(scope="module")
def gt_file(tmp_path_factory):
    src = GOLDEN / "cocoeval_gt.json"
    if not src.exists():
        pytest.skip("cocoeval golden fixtures missing")
    return str(src)


def make_samples(gt_file, noise=2.0, seed=0):
    from probpose_code_tpu.structures.keypoint import find_min_padding_exact

    rng = np.random.RandomState(seed)
    gt = json.loads(pathlib.Path(gt_file).read_text())
    samples = []
    for ann in gt["annotations"]:
        kpts = np.array(ann["keypoints"], dtype=np.float32).reshape(1, -1, 3)
        pred_kpts = kpts[..., :2] + rng.randn(*kpts[..., :2].shape) * noise
        vis = kpts[..., 2]
        # an ideal model predicts "in image" only for keypoints inside the
        # 1.25-padded activation window
        pad = find_min_padding_exact(np.array(ann["bbox"]), np.array(ann["keypoints"]))
        in_window = (pad <= 1.25) & (pad >= 0)
        sample = PoseDataSample()
        sample.set_metainfo(dict(id=ann["id"], img_id=ann["image_id"], category_id=1))
        pred = InstanceData()
        pred.set_field(pred_kpts.astype(np.float32), "keypoints")
        pred.set_field(np.clip(0.9 + 0.1 * rng.rand(1, kpts.shape[1]), 0, 1).astype(np.float32), "keypoint_scores")
        probs = np.where(in_window, 0.9 + 0.1 * rng.rand(len(in_window)), 0.05 * rng.rand(len(in_window)))
        pred.set_field(probs[None].astype(np.float32), "keypoints_probs")
        pred.set_field((vis == 2).astype(np.float32), "keypoints_visible")
        sample.pred_instances = pred
        gti = InstanceData()
        gti.set_field(np.ones(1, dtype=np.float32), "bbox_scores")
        sample.gt_instances = gti
        samples.append(sample)
    return samples


def test_coco_metric_end_to_end(gt_file):
    metric = CocoMetric(
        ann_file=gt_file,
        extended=[False, True],
        match_by_bbox=[False, False],
        score_thresh_type="prob",
        keypoint_score_thr=0.45,
        padding=1.25,
        prefix="COCO",
    )
    metric.dataset_meta = parse_pose_metainfo({"dataset_name": "coco"})
    metric.process(None, make_samples(gt_file))
    results = metric.evaluate()

    assert "COCO/AP" in results
    assert "COCO/Ex_AP" in results
    assert "COCO/AP .5" in results
    assert "COCO/Ex_OKS" in results
    # near-perfect predictions -> very high AP under both metrics
    assert results["COCO/AP"] > 0.9, results["COCO/AP"]
    assert results["COCO/Ex_AP"] > 0.85, results["COCO/Ex_AP"]
    # diagnostics present
    assert "COCO/vis_acc" in results or "COCO/prob_acc" in results


def test_coco_metric_degraded_predictions(gt_file):
    metric = CocoMetric(ann_file=gt_file, extended=[False], prefix="COCO")
    metric.dataset_meta = parse_pose_metainfo({"dataset_name": "coco"})
    metric.process(None, make_samples(gt_file, noise=40.0))
    worse = metric.evaluate()

    metric2 = CocoMetric(ann_file=gt_file, extended=[False], prefix="COCO")
    metric2.dataset_meta = parse_pose_metainfo({"dataset_name": "coco"})
    metric2.process(None, make_samples(gt_file, noise=2.0))
    better = metric2.evaluate()
    assert better["COCO/AP"] > worse["COCO/AP"]
