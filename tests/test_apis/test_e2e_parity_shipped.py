"""Golden-AP / decode-decision parity for the SHIPPED serving settings.

The flagship recipe ships ``dtype=bfloat16`` + ``approximate_gelu=True``
with ``fused_layers`` on auto (Pallas whole-layer kernels on TPU, identical
XLA math elsewhere — kernel==XLA parity is pinned separately in
tests/test_ops/test_vit_layer_fused.py). This file proves the NUMERIC side
of the fast path at full ProbPose-S geometry against the reference-pipeline
golden fixtures (f32 torch numerics):

measured on these fixtures (random-weight heatmaps — a worst case for dtype
drift because peaks are unpeaked): p50 0.019 px, p90 0.12 px, aux-field
maxdiff <= 5e-3, AP delta 0.026, Ex_AP delta 0.032 — comfortably inside the
BASELINE north-star bar ("COCO AP and Ex-OKS within 0.1 of the PyTorch
reference"). About 1% of keypoints flip argmax entirely on these synthetic
heatmaps (p99 ~100 px), which is why the bars below are p90 + AP, not p99.

Reference analog: the reference's shipped config is its fast path
(``configs/body_2d_keypoint/topdown_probmap/coco/td-pm_ProbPose-small_8xb64-210e_coco-256x192.py``).
"""

import copy
import json
import pathlib
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

GOLDEN = pathlib.Path(__file__).parent.parent / "golden"
REPO = pathlib.Path(__file__).parent.parent.parent

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not (GOLDEN / "e2e_full_pipeline.npz").exists(),
        reason="full e2e fixtures missing (run tools/make_golden_e2e.py --full)",
    ),
]


@pytest.fixture(scope="module")
def fixture():
    data = np.load(GOLDEN / "e2e_full_pipeline.npz")
    with open(GOLDEN / "e2e_full_coco.json") as f:
        gt = json.load(f)
    return data, gt


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    sys.path.insert(0, str(REPO / "tools"))
    from _e2e_torch_model import build_e2e_model

    from probpose_code_tpu.apis import init_model
    from tests.test_apis.test_e2e_parity_full import MODEL_CFG

    torch_model = build_e2e_model(full=True)
    path = tmp_path_factory.mktemp("e2e_shipped") / "w.pth"
    torch.save(torch_model.state_dict(), str(path))

    cfg = copy.deepcopy(MODEL_CFG)
    # the shipped recipe's serving-speed fields (fused_layers stays on auto:
    # XLA math here, Pallas on TPU — numerically interchangeable per the
    # kernel parity suite)
    cfg["model"]["backbone"]["dtype"] = "bfloat16"
    cfg["model"]["backbone"]["approximate_gelu"] = True
    cfg["model"]["head"]["dtype"] = "bfloat16"
    return init_model(cfg, checkpoint=str(path))


def test_shipped_settings_golden_parity(model, fixture):
    from tests.test_apis.test_e2e_parity_full import _run_inference

    data, gt = fixture
    samples = _run_inference(model, fixture)
    by_id = {s.metainfo["id"]: s for s in samples}
    ids = data["pred_ids"]
    ours = np.stack([np.asarray(by_id[i].pred_instances["keypoints"]).reshape(17, 2) for i in ids])
    err = np.linalg.norm(ours - data["pred_keypoints"], axis=-1)
    assert np.percentile(err, 50) < 0.2, f"p50 {np.percentile(err, 50):.3f}px"
    assert np.percentile(err, 90) < 0.75, f"p90 {np.percentile(err, 90):.3f}px"

    for field, key, tol in [
        ("keypoints_probs", "pred_keypoint_probs", 2e-2),
        ("keypoints_visible", "pred_keypoints_visible", 2e-2),
        ("keypoints_oks", "pred_keypoint_scores", 2e-2),
        ("keypoints_error", "pred_keypoint_errors", 2e-2),
    ]:
        o = np.stack([np.asarray(by_id[i].pred_instances[field]).reshape(17) for i in ids])
        np.testing.assert_allclose(o, data[key], atol=tol, err_msg=field)

    from probpose_code_tpu.datasets.metainfo import parse_pose_metainfo
    from probpose_code_tpu.evaluation import CocoMetric

    metric = CocoMetric(
        ann_file=str(GOLDEN / "e2e_full_coco.json"),
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

    # the north-star bar is 0.1; measured drift on these worst-case fixtures
    # is 0.026 / 0.032 — assert the tighter 0.05
    assert abs(results["AP"] - data["stats"][0]) < 0.05
    assert abs(results["Ex_AP"] - data["Ex_stats"][0]) < 0.05
