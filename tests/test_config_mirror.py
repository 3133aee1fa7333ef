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
