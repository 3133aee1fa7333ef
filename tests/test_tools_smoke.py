"""Smoke tests for the analysis/misc CLI tools (reference ``tools/``)."""

import os.path as osp
import subprocess
import sys

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
ENV = dict(JAX_PLATFORMS="cpu", PATH="/usr/bin:/bin", HOME="/root")


def _run(args, **kw):
    import os

    env = dict(os.environ, **ENV)
    return subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=300, **kw)


def test_print_config():
    r = _run(["tools/misc/print_config.py",
              "configs/body_2d_keypoint/topdown_heatmap/coco/td-hm_hrnet-w32_8xb64-210e_coco-256x192.py",
              "--cfg-options", "train_dataloader.batch_size=2"])
    assert r.returncode == 0, r.stderr[-800:]
    assert "HeatmapHead" in r.stdout and "batch_size=2" in r.stdout.replace("'", "").replace(": ", "=")


def test_analyze_logs(tmp_path):
    log = tmp_path / "train.log"
    log.write_text(
        "Epoch [1][10/100] lr: 0.001 loss: 2.5 acc: 0.1\n"
        "Epoch [1][20/100] lr: 0.001 loss: 2.0 acc: 0.2\n"
        "Epoch [2][10/100] lr: 0.001 loss: 1.5 acc: 0.3\n"
    )
    r = _run(["tools/analysis_tools/analyze_logs.py", "cal_train_time", str(log)])
    ok_time = r.returncode == 0
    r2 = _run(["tools/analysis_tools/analyze_logs.py", "plot_curve", str(log),
               "--keys", "loss", "--out", str(tmp_path / "c.png")])
    assert ok_time or r2.returncode == 0, (r.stderr[-500:], r2.stderr[-500:])


def test_get_flops_tiny():
    r = _run(["tools/analysis_tools/get_flops.py",
              "configs/body_2d_keypoint/topdown_heatmap/coco/td-hm_res50_8xb64-210e_coco-256x192.py",
              "--shape", "64", "48"])
    assert r.returncode == 0, r.stderr[-800:]
    assert "FLOP" in r.stdout or "flops" in r.stdout.lower()


def test_config_parity_audit_clean():
    """The zoo has zero content drift vs the reference on the audited
    fields (tools/analysis_tools/audit_config_parity.py)."""
    import os
    import pytest
    if not os.path.isdir("/root/reference/configs"):
        pytest.skip("reference checkout not available")
    res = _run(["tools/analysis_tools/audit_config_parity.py"])
    assert res.returncode == 0, res.stdout[-3000:]
