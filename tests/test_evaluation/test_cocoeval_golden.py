"""Parity test: our Ex-OKS COCOeval vs reference evaluator golden stats."""

import json
import pathlib

import numpy as np
import pytest

from probpose_code_tpu.datasets.coco_api import COCO
from probpose_code_tpu.evaluation.cocoeval import COCOeval

GOLDEN = pathlib.Path(__file__).parent.parent / "golden"


@pytest.fixture(scope="module")
def data():
    gt_file = GOLDEN / "cocoeval_gt.json"
    if not gt_file.exists():
        pytest.skip("cocoeval golden fixtures missing (run tools/make_golden_cocoeval.py)")
    gt = json.loads(gt_file.read_text())
    dt = json.loads((GOLDEN / "cocoeval_dt.json").read_text())
    stats = np.load(GOLDEN / "cocoeval_stats.npz", allow_pickle=True)
    return gt, dt, stats


@pytest.mark.parametrize(
    "name,kwargs",
    [
        ("classic", dict(extended_oks=False, match_by_bbox=False)),
        ("extended", dict(extended_oks=True, match_by_bbox=False)),
        ("extended_bbox", dict(extended_oks=True, match_by_bbox=True)),
        ("classic_noarea", dict(extended_oks=False, match_by_bbox=False, use_area=False)),
    ],
)
def test_stats_match_reference(data, name, kwargs):
    gt_data, dt_data, golden = data
    cocoGt = COCO(dataset=json.loads(json.dumps(gt_data)))
    cocoDt = COCO(dataset=json.loads(json.dumps(dt_data)))
    ev = COCOeval(cocoGt, cocoDt, iouType="keypoints", **kwargs)
    ev.verbose = False
    ev.evaluate()
    ev.accumulate()
    ev.summarize()

    ref_stats = golden[f"{name}_stats"]
    ref_names = [str(n) for n in golden[f"{name}_names"]]
    assert ev.stats_names == ref_names
    np.testing.assert_allclose(ev.stats, ref_stats, atol=1e-6, err_msg=f"{name}: {ev.stats_names}")
    np.testing.assert_allclose(
        np.mean(ev.loc_similarities), golden[f"{name}_loc_sim"][0], atol=1e-6
    )
