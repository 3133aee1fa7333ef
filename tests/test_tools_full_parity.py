"""Smoke tests for tools/full_parity_eval.py (the BASELINE parity gate).

The full-scale path is exercised on a tiny synthetic val2017 with a shrunken
ProbPose graph (plumbing: config rewrite, Runner.val, report). The offline
golden gate shares its heavy path with tests/test_apis/test_e2e_parity_full
(marked slow there); here we additionally drive it through the CLI.
"""

import json
import os
import os.path as osp
import shutil
import subprocess
import sys

import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def _run(args, timeout=900):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable] + args, cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout
    )


@pytest.fixture(scope="module")
def coco_val_root(tmp_path_factory):
    """Synthetic val2017 in the layout the reference recipe expects."""
    from probpose_code_tpu.testing import make_synthetic_coco

    base = tmp_path_factory.mktemp("parity_coco")
    made = make_synthetic_coco(str(base / "raw"), num_images=6, instances_per_image=2, img_size=(160, 200))
    root = base / "coco"
    (root / "annotations").mkdir(parents=True)
    shutil.copy(made["ann_file"], root / "annotations" / "person_keypoints_val2017.json")
    shutil.copytree(made["img_dir"], root / "val2017")
    return str(root)


def test_full_path_plumbing(coco_val_root, tmp_path):
    """Real-data path on a tiny graph: config-root rewrite, CropCOCO drop,
    Runner.val, report JSON."""
    tiny = tmp_path / "tiny_probpose.py"
    tiny.write_text(
        '_base_ = ["{}/configs/body_2d_keypoint/topdown_probmap/coco/'
        'td-pm_ProbPose-small_8xb64-210e_coco-256x192.py"]\n'
        "model = dict(\n"
        "    backbone=dict(arch=dict(embed_dims=32, num_layers=2, num_heads=2, feedforward_channels=64)),\n"
        "    head=dict(in_channels=32, deconv_out_channels=(16, 16), deconv_kernel_sizes=(4, 4)),\n"
        ")\n".format(REPO)
    )
    out = tmp_path / "report.json"
    r = _run(
        [
            "tools/full_parity_eval.py",
            "--data-root", coco_val_root,
            "--config", str(tiny),
            "--batch-size", "4",
            "--out", str(out),
        ]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    report = json.loads(out.read_text())
    assert "COCO/AP" in report["metrics"]
    assert report["ok"] is True
    assert "Parity table" in r.stdout


def test_report_delta_gate(tmp_path):
    """The delta gate fails runs outside the BASELINE tolerance and passes
    runs inside it — without re-running any model."""
    sys.path.insert(0, osp.join(REPO, "tools"))
    import full_parity_eval as fpe

    ours = {"AP": 0.700, "Ex_AP": 0.650}
    ok = fpe._report(ours, {"AP": 0.705, "Ex_AP": 0.645}, tol=0.1, out_path=str(tmp_path / "a.json"))
    assert ok == 0
    bad = fpe._report(ours, {"AP": 0.850}, tol=0.1, out_path=str(tmp_path / "b.json"))
    assert bad == 1
    rep = json.loads((tmp_path / "b.json").read_text())
    assert rep["failures"][0]["metric"] == "AP"


@pytest.mark.slow
def test_offline_golden_gate_cli():
    """The no-data fallback runs the committed golden mini-COCO gate through
    the CLI and lands within the bar (full ProbPose-S geometry)."""
    if not osp.exists(osp.join(REPO, "tests", "golden", "e2e_full_pipeline.npz")):
        pytest.skip("full golden fixture missing")
    r = _run(["tools/full_parity_eval.py"], timeout=2400)
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-2000:])
    assert "golden mini-COCO gate" in r.stdout
    assert "OK:" in r.stdout
