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
    # the declared pipelines must compose and every custom hook must build —
    # guards against recipes writing transform/hook schemas the runtime
    # doesn't accept (e.g. the EMAHook dicts every RTMO recipe carries)
    from probpose_code_tpu.datasets.base_dataset import Compose
    from probpose_code_tpu.registry import HOOKS
    from probpose_code_tpu.utils import register_all_modules

    register_all_modules()
    for key in ("train_pipeline", "val_pipeline", "train_pipeline_stage2"):
        if key in cfg and isinstance(cfg[key], list):
            Compose(cfg[key])
    for h in cfg.get("custom_hooks", []):
        HOOKS.build(dict(h))


def _unique_arch_configs():
    """One config per (estimator, backbone, head) combo — forward smoke set.

    Full per-config forwards would recompile ~70 XLA programs on this 1-CPU
    box; architecture coverage dedupes to the distinct module graphs.
    """
    seen = {}
    for p in ALL_CONFIGS:
        try:
            cfg = Config.fromfile(str(p))
        except Exception:
            continue
        m = cfg.get("model")
        if not m or m.get("type") == "PoseLifter":
            continue
        key = (
            m.get("type"),
            (m.get("backbone") or {}).get("type"),
            (m.get("head") or {}).get("type"),
        )
        seen.setdefault(key, p)
    return sorted(seen.values())


@pytest.mark.parametrize("path", _unique_arch_configs(), ids=lambda p: p.stem)
def test_config_forward_smoke(path):
    import jax.numpy as jnp
    import numpy as np

    from probpose_code_tpu.datasets.metainfo import parse_pose_metainfo
    from probpose_code_tpu.models import PoseModel

    cfg = Config.fromfile(str(path))
    model_cfg = dict(cfg["model"])
    # shrink the ViT variants so CPU compiles stay cheap; conv nets keep
    # their shipped topology
    bb = dict(model_cfg.get("backbone") or {})
    # exact-type check: "PyramidVisionTransformer" must not match
    if str(bb.get("type", "")).split(".")[-1] == "VisionTransformer":
        bb["arch"] = {"embed_dims": 64, "num_layers": 2, "num_heads": 4, "feedforward_channels": 128}
        model_cfg["backbone"] = bb
        head = dict(model_cfg["head"])
        head["in_channels"] = 64
        head["deconv_out_channels"] = (32, 32)
        model_cfg["head"] = head
    if str((model_cfg.get("head") or {}).get("type")) == "EDPoseHead":
        # shrink the DETR stack: the shipped 6+6-layer/900-query graph
        # compiles for many minutes on this 1-CPU box; 1+3 layers cover the
        # same module graph (incl. the query expansion at layer 2)
        head = dict(model_cfg["head"])
        head["num_queries"] = 20
        head["encoder"] = {**head["encoder"], "num_layers": 1}
        head["decoder"] = {**head["decoder"], "num_layers": 3, "num_group": 3}
        model_cfg["head"] = head
    meta_name = "coco"
    m = PoseModel(model_cfg, metainfo=parse_pose_metainfo({"dataset_name": meta_name}))
    if m.onestage:
        w, h = 320, 320
    else:
        # cap the smoke input: compiling e.g. EDPose at its shipped 800x800
        # costs minutes on this 1-CPU box and adds no graph coverage.
        # Hourglass needs power-of-two-friendly sizes (odd skip shapes break)
        cap = 256 if "Hourglass" in str((model_cfg.get("backbone") or {}).get("type", "")) else 320
        w, h = min(m.input_size[0], cap), min(m.input_size[1], cap)
    m.init(input_shape=(1, h, w, 3))
    import jax

    out = m.forward(m.variables, jnp.zeros((1, h, w, 3)))
    for leaf in jax.tree_util.tree_leaves(out):
        assert np.isfinite(np.asarray(leaf)).all()

    # every head family must also route through make_predict — the program
    # runner.val / the inference APIs drive. flip_test=False: the smoke
    # builds with COCO metainfo regardless of the head's keypoint count, so
    # flip permutations would mis-gather (decode itself is count-agnostic).
    if m.is_lifter:
        return  # lifter inputs are keypoint sequences, covered separately
    if str((model_cfg.get("head") or {}).get("type")) == "EDPoseHead":
        predict = m.make_predict(flip_test=False, jit=False)
        preds = predict(m.variables, jnp.zeros((1, h, w, 3)))
        assert "pred_logits" in preds
        return
    predict = m.make_predict(flip_test=False, jit=False)
    preds = predict(m.variables, jnp.zeros((1, h, w, 3)))
    assert isinstance(preds, dict) and preds, type(preds)
