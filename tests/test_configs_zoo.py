"""Every shipped config must load and its model section must build."""

import pathlib

import pytest

from probpose_code_tpu.config import Config
from probpose_code_tpu.models.builder import build_pose_estimator

CONFIG_ROOT = pathlib.Path(__file__).parent.parent / "configs"
ALL_CONFIGS = sorted(
    p for p in CONFIG_ROOT.rglob("*.py") if "_base_" not in p.parts
)


@pytest.mark.parametrize("path", ALL_CONFIGS, ids=lambda p: p.stem)
def test_config_loads_and_model_builds(path):
    cfg = Config.fromfile(str(path))
    if "model" in cfg:
        module, aux = build_pose_estimator(cfg["model"])
        assert module is not None
    elif "distiller" in cfg:
        assert cfg["distiller"]["type"] == "DWPoseDistiller"
    else:
        pytest.fail(f"config {path} has neither model nor distiller")
