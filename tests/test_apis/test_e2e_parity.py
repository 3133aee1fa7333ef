"""End-to-end accuracy parity vs the reference pipeline (north-star bar).

The golden fixture (tools/make_golden_e2e.py) ran the REFERENCE numerics —
cv2 UDP crop, torch tiny-ProbPose forward, flip-TTA, scipy expected-OKS
decode, CocoMetric scoring/OKS-NMS, Ex-OKS COCOeval — over a synthetic
mini-COCO and recorded per-instance keypoints plus the final AP stats.

Here the SAME images and torch weights flow through OUR stack:
``convert_torch_state_dict`` -> ``inference_topdown`` (host pipeline + jitted
forward/decode) -> ``CocoMetric(extended=[False, True])`` — and must land
within the BASELINE.md bar: COCO AP and Ex-OKS AP within 0.1 of the
reference (we assert much tighter), keypoints within a heatmap cell.

Reference flow covered: mmpose/apis/inference.py:133 ->
codecs/probmap.py:170 -> evaluation/metrics/coco_metric.py:459.
"""

import json
import pathlib

import numpy as np
import pytest

torch = pytest.importorskip("torch")

GOLDEN = pathlib.Path(__file__).parent.parent / "golden"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
    not (GOLDEN / "e2e_pipeline.npz").exists(), reason="e2e fixtures missing (run tools/make_golden_e2e.py)"
    ),
]


@pytest.fixture(scope="module")
def fixture():
    data = np.load(GOLDEN / "e2e_pipeline.npz")
    with open(GOLDEN / "e2e_coco.json") as f:
        gt = json.load(f)
    return data, gt


@pytest.fixture(scope="module")
def model():
    from probpose_code_tpu.apis import init_model

    cfg = dict(
        model=dict(
            type="TopdownPoseEstimator",
            data_preprocessor=dict(
                type="PoseDataPreprocessor",
                mean=[123.675, 116.28, 103.53],
                std=[58.395, 57.12, 57.375],
                bgr_to_rgb=True,
            ),
            backbone=dict(
                type="VisionTransformer",
                arch=dict(embed_dims=64, num_layers=2, num_heads=4, feedforward_channels=128),
                img_size=(256, 192),
                patch_size=16,
                with_cls_token=False,
                out_type="featmap",
                patch_cfg=dict(padding=2),
            ),
            head=dict(
                type="ProbMapHead",
                in_channels=64,
                out_channels=17,
                deconv_out_channels=(32, 32),
                deconv_kernel_sizes=(4, 4),
                keypoint_loss=dict(type="OKSHeatmapLoss", use_target_weight=True, smoothing_weight=0.05),
                probability_loss=dict(type="BCELoss", use_target_weight=True, use_sigmoid=True),
                visibility_loss=dict(type="BCELoss", use_target_weight=True, use_sigmoid=True),
                oks_loss=dict(type="MSELoss", use_target_weight=True),
                error_loss=dict(type="L1LogLoss", use_target_weight=True),
                normalize=1.0,
                freeze_error=True,
                freeze_oks=False,
                decoder=dict(type="ProbMap", input_size=(192, 256), heatmap_size=(48, 64), sigma=-1),
            ),
            test_cfg=dict(flip_test=True, flip_mode="heatmap", shift_heatmap=False),
        )
    )
    return init_model(cfg, checkpoint=str(GOLDEN / "e2e_weights.pth"))


def _run_inference(model, fixture):
    from probpose_code_tpu.apis import inference_topdown

    data, gt = fixture
    anns_by_img = {}
    for a in gt["annotations"]:
        anns_by_img.setdefault(a["image_id"], []).append(a)

    samples = []
    for im in gt["images"]:
        img = data[f"img_{im['id']}"]
        anns = anns_by_img[im["id"]]
        bboxes = np.array([[a["bbox"][0], a["bbox"][1], a["bbox"][0] + a["bbox"][2], a["bbox"][1] + a["bbox"][3]] for a in anns], np.float32)
        preds = inference_topdown(model, img, bboxes=bboxes)
        assert len(preds) == len(anns)
        for ann, sample in zip(anns, preds):
            sample.set_metainfo(dict(id=ann["id"], img_id=im["id"]))
            samples.append(sample)
    return samples


def test_e2e_keypoint_and_ap_parity(model, fixture):
    data, gt = fixture
    samples = _run_inference(model, fixture)

    # ---- per-instance keypoints vs reference decode --------------------
    by_id = {s.metainfo["id"]: s for s in samples}
    ids = data["pred_ids"]
    ours = np.stack([np.asarray(by_id[i].pred_instances["keypoints"]).reshape(17, 2) for i in ids])
    ref = data["pred_keypoints"]
    # scale px tolerance by instance size: both stacks used identical cv2
    # crops, so residual error is flax-vs-torch numerics through the decode
    err = np.linalg.norm(ours - ref, axis=-1)
    assert np.percentile(err, 99) < 1.0, f"p99 keypoint error {np.percentile(err, 99):.3f}px"
    assert err.max() < 5.0, f"max keypoint error {err.max():.3f}px"

    for field, key in [
        ("keypoints_probs", "pred_keypoint_probs"),
        ("keypoints_visible", "pred_keypoints_visible"),
        ("keypoints_oks", "pred_keypoint_scores"),
        ("keypoints_error", "pred_keypoint_errors"),
    ]:
        o = np.stack([np.asarray(by_id[i].pred_instances[field]).reshape(17) for i in ids])
        np.testing.assert_allclose(o, data[key], atol=2e-3, err_msg=field)

    # ---- full metric: AP / Ex-OKS AP within 0.1 (north star) -----------
    from probpose_code_tpu.datasets.metainfo import parse_pose_metainfo
    from probpose_code_tpu.evaluation import CocoMetric

    metric = CocoMetric(
        ann_file=str(GOLDEN / "e2e_coco.json"),
        extended=[False, True],
        match_by_bbox=[False, False],
        ignore_border_points=[False, False],
        padding=1.25,
        score_thresh_type="prob",
        keypoint_score_thr=0.45,
    )
    metric.dataset_meta = parse_pose_metainfo({"dataset_name": "coco"})
    metric.process(None, samples)
    results = metric.compute_metrics(metric.results)

    ref_stats = data["stats"]
    ref_ex = data["Ex_stats"]
    assert results["prob_thr"] == pytest.approx(float(data["prob_thr"]), abs=1e-6)
    assert abs(results["AP"] - ref_stats[0]) < 0.1, f"AP {results['AP']:.4f} vs ref {ref_stats[0]:.4f}"
    assert abs(results["Ex_AP"] - ref_ex[0]) < 0.1, f"Ex_AP {results['Ex_AP']:.4f} vs ref {ref_ex[0]:.4f}"
    # the pipeline is numerically matched end to end, so in practice the
    # agreement is far tighter than the 0.1 bar
    assert abs(results["AP"] - ref_stats[0]) < 0.01
    assert abs(results["Ex_AP"] - ref_ex[0]) < 0.01
