"""End-to-end accuracy parity #2: HRNet + UDP heatmaps vs the reference
pipeline on a golden mini-COCO.

The fixture (tools/make_golden_e2e_udp.py) ran the REFERENCE numerics —
cv2 UDP crop, torch tiny-HRNet forward, flip-TTA, argmax + DARK-UDP
refinement decode, bbox_keypoint scoring, OKS-NMS, COCOeval — and recorded
per-instance keypoints plus AP stats. The SAME images and torch weights
flow here through ``convert_torch_state_dict`` -> ``inference_topdown`` ->
``CocoMetric``: keypoints must match within a pixel and AP within the
north-star 0.1 bar (asserted much tighter).

Reference flow covered: apis/inference.py:133 -> codecs/udp_heatmap.py:146
(get_heatmap_maximum + refine_keypoints_dark_udp) ->
evaluation/metrics/coco_metric.py:459.
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
    not (GOLDEN / "e2e_udp_pipeline.npz").exists(),
    reason="UDP e2e fixtures missing (run tools/make_golden_e2e_udp.py)",
    ),
]


@pytest.fixture(scope="module")
def fixture():
    data = np.load(GOLDEN / "e2e_udp_pipeline.npz")
    with open(GOLDEN / "e2e_udp_coco.json") as f:
        gt = json.load(f)
    return data, gt


@pytest.fixture(scope="module")
def model():
    from probpose_code_tpu.apis import init_model
    from tests.test_engine.test_torch_conversion import TINY_HRNET_EXTRA

    cfg = dict(
        model=dict(
            type="TopdownPoseEstimator",
            data_preprocessor=dict(
                type="PoseDataPreprocessor",
                mean=[123.675, 116.28, 103.53],
                std=[58.395, 57.12, 57.375],
                bgr_to_rgb=True,
            ),
            backbone=dict(type="HRNet", in_channels=3, extra=TINY_HRNET_EXTRA),
            head=dict(
                type="HeatmapHead",
                in_channels=8,
                out_channels=17,
                deconv_out_channels=None,
                final_layer=dict(kernel_size=1),
                loss=dict(type="KeypointMSELoss", use_target_weight=True),
                decoder=dict(type="UDPHeatmap", input_size=(192, 256), heatmap_size=(48, 64), sigma=2),
            ),
            test_cfg=dict(flip_test=True, flip_mode="heatmap", shift_heatmap=False),
        )
    )
    return init_model(cfg, checkpoint=str(GOLDEN / "e2e_udp_weights.pth"))


def test_e2e_udp_keypoint_and_ap_parity(model, fixture):
    from probpose_code_tpu.apis import inference_topdown
    from probpose_code_tpu.datasets.metainfo import parse_pose_metainfo
    from probpose_code_tpu.evaluation import CocoMetric

    data, gt = fixture
    anns_by_img = {}
    for a in gt["annotations"]:
        anns_by_img.setdefault(a["image_id"], []).append(a)

    samples = []
    for im in gt["images"]:
        img = data[f"img_{im['id']}"]
        anns = anns_by_img[im["id"]]
        bboxes = np.array(
            [[a["bbox"][0], a["bbox"][1], a["bbox"][0] + a["bbox"][2], a["bbox"][1] + a["bbox"][3]] for a in anns],
            np.float32,
        )
        preds = inference_topdown(model, img, bboxes=bboxes)
        assert len(preds) == len(anns)
        for ann, sample in zip(anns, preds):
            sample.set_metainfo(dict(id=ann["id"], img_id=im["id"]))
            samples.append(sample)

    by_id = {s.metainfo["id"]: s for s in samples}
    ids = data["pred_ids"]
    ours = np.stack([np.asarray(by_id[i].pred_instances["keypoints"]).reshape(17, 2) for i in ids])
    ref = data["pred_keypoints"]
    # exclude reference-side DARK divergences: on flat log-clipped maps the
    # reference's pinv(eps*I) Newton step shoots coordinates thousands of px
    # out of frame — garbage on both sides, no decode signal (3/289 here)
    sane = np.all(np.abs(ref) < 1000.0, axis=-1)
    assert sane.mean() > 0.97
    err = np.linalg.norm(ours - ref, axis=-1)[sane]
    assert np.percentile(err, 99) < 1.0, f"p99 keypoint error {np.percentile(err, 99):.3f}px"
    # at most one borderline case may sit near the reference's pinv rcond
    # cutoff, where the Newton step direction is numerically unstable
    assert (err > 5.0).sum() <= 1, f"{(err > 5.0).sum()} keypoints beyond 5px"

    scores = np.stack([np.asarray(by_id[i].pred_instances["keypoint_scores"]).reshape(17) for i in ids])
    np.testing.assert_allclose(scores, data["pred_keypoint_scores"], atol=2e-3)

    metric = CocoMetric(ann_file=str(GOLDEN / "e2e_udp_coco.json"), extended=[False])
    metric.dataset_meta = parse_pose_metainfo({"dataset_name": "coco"})
    metric.process(None, samples)
    results = metric.compute_metrics(metric.results)

    ref_ap = data["stats"][0]
    assert abs(results["AP"] - ref_ap) < 0.1, f"AP {results['AP']:.4f} vs ref {ref_ap:.4f}"
    # numerically matched end to end -> far tighter than the bar
    assert abs(results["AP"] - ref_ap) < 0.01
