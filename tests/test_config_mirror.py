"""In-package config mirror (reference ``mmpose/configs/`` for OpenMIM
distribution): every mirrored config must load standalone."""

import glob
import os.path as osp

import pytest

import probpose_code_tpu

PKG = osp.dirname(probpose_code_tpu.__file__)
MIRROR = sorted(glob.glob(osp.join(PKG, "configs", "**", "*.py"), recursive=True))
MIRROR = [p for p in MIRROR if "_base_" not in p]


def test_mirror_exists():
    assert len(MIRROR) >= 8


@pytest.mark.parametrize("path", MIRROR, ids=[osp.basename(p) for p in MIRROR])
def test_mirror_config_loads(path):
    from probpose_code_tpu.config import Config

    cfg = Config.fromfile(path)
    assert "model" in cfg and "type" in cfg.model


def test_mirror_content_in_sync_with_repo_zoo():
    """The package mirror must stay byte-identical to the repo configs/ tree
    (guards the drift where later zoo edits missed the mirror)."""
    repo_root = osp.dirname(osp.dirname(osp.abspath(__file__)))
    all_mirrored = sorted(glob.glob(osp.join(PKG, "configs", "**", "*.py"), recursive=True))
    assert all_mirrored
    for path in all_mirrored:
        rel = osp.relpath(path, osp.join(PKG, "configs"))
        src = osp.join(repo_root, "configs", rel)
        assert osp.exists(src), f"mirror file has no zoo source: {rel}"
        with open(path) as f_m, open(src) as f_s:
            assert f_m.read() == f_s.read(), f"mirror drifted from configs/: {rel}"
