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


def test_coco_metric_diagnostics(gt_file):
    """Opt-in diagnostics: vector-field stats and OKS-vs-crowding bins
    (reference coco_metric.py:752/:1085, which compute without returning)."""
    metric = CocoMetric(ann_file=gt_file, extended=[False], prefix="COCO", diagnostics=True)
    metric.dataset_meta = parse_pose_metainfo({"dataset_name": "coco"})
    metric.process(None, make_samples(gt_file, noise=4.0))
    results = metric.evaluate()
    assert "COCO/vec_err_mean" in results and results["COCO/vec_err_mean"] >= 0
    assert "COCO/gt_out_of_window_rate" in results
    assert "COCO/dt_out_of_bbox_rate" in results
    assert "COCO/oks_mean" in results and 0 <= results["COCO/oks_mean"] <= 1
    # small noise -> high OKS; error vectors scale with noise
    m2 = CocoMetric(ann_file=gt_file, extended=[False], prefix="COCO", diagnostics=True)
    m2.dataset_meta = parse_pose_metainfo({"dataset_name": "coco"})
    m2.process(None, make_samples(gt_file, noise=30.0))
    noisy = m2.evaluate()
    assert noisy["COCO/vec_err_mean"] > results["COCO/vec_err_mean"]
    assert noisy["COCO/oks_mean"] < results["COCO/oks_mean"]


def test_heatmap_calibration_eval(gt_file):
    """Calibration curve: a perfectly calibrated probmap (mass exactly at the
    GT pixel) concentrates the binned ratio in the top band."""
    metric = CocoMetric(ann_file=gt_file, extended=[False], prefix="COCO")
    metric.dataset_meta = parse_pose_metainfo({"dataset_name": "coco"})
    rng = np.random.RandomState(0)
    B, C, H, W = 6, 17, 64, 48
    yy, xx = np.mgrid[:H, :W]
    aboxes = np.tile(np.array([0.0, 0.0, 192.0, 256.0], np.float32), (B, 1))
    gt_kpts = np.zeros((B, C, 3), np.float32)
    heatmaps = np.zeros((B, C, H, W), np.float32)
    for b in range(B):
        for c in range(C):
            x_hm, y_hm = rng.randint(4, W - 4), rng.randint(4, H - 4)
            g = np.exp(-((yy - y_hm) ** 2 + (xx - x_hm) ** 2) / 8.0)
            heatmaps[b, c] = g / g.sum()  # normalized probability mass
            gt_kpts[b, c] = [x_hm * (192 - 1) / (W - 1), y_hm * (256 - 1) / (H - 1), 2]
    x_labels, ratios, areas = metric._do_heatmap_calibrations_eval(gt_kpts, heatmaps, aboxes)
    assert len(x_labels) == len(ratios) == len(areas) == 20
    assert ratios.sum() == pytest.approx(1.0, abs=1e-5)
    # GT sits at the peak -> the top-mass bands (last entries after the
    # reference's reversal) hold far more than the uniform 5% share
    assert ratios[-4:].sum() > 0.5
    assert ratios[0] < 0.05


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


def test_coco_metric_bottomup_list_ids(gt_file, capfd):
    """Bottomup predictions carry the image's ann-id LIST (no per-instance
    ann id), which used to crash the visibility/vector-field diagnostics
    with ``TypeError: unhashable type: 'list'`` (swallowed as a printed
    traceback inside compute_metrics). They must no-op cleanly instead."""
    from collections import defaultdict

    gt = json.loads(pathlib.Path(gt_file).read_text())
    by_img = defaultdict(list)
    for ann in gt["annotations"]:
        by_img[ann["image_id"]].append(ann)

    rng = np.random.RandomState(0)
    samples = []
    for img_id, anns in by_img.items():
        kpts = np.stack([np.array(a["keypoints"], np.float32).reshape(-1, 3) for a in anns])
        sample = PoseDataSample()
        # bottomup contract: one sample per image, id = list of ann ids
        sample.set_metainfo(dict(id=[a["id"] for a in anns], img_id=img_id, category_id=1))
        pred = InstanceData()
        pred.set_field(kpts[..., :2] + rng.randn(*kpts[..., :2].shape) * 2, "keypoints")
        pred.set_field(np.full(kpts.shape[:2], 0.9, np.float32), "keypoint_scores")
        sample.pred_instances = pred
        gti = InstanceData()
        gti.set_field(np.ones(len(anns), np.float32), "bbox_scores")
        sample.gt_instances = gti
        samples.append(sample)

    metric = CocoMetric(ann_file=gt_file, extended=[False], prefix="COCO",
                        score_mode="bbox", nms_mode="none", diagnostics=True)
    metric.dataset_meta = parse_pose_metainfo({"dataset_name": "coco"})
    metric.process(None, samples)
    results = metric.evaluate()
    captured = capfd.readouterr()
    assert "Traceback" not in captured.err, captured.err[-2000:]
    assert results["COCO/AP"] > 0.5  # near-perfect keypoints still score
