"""API tests: init_model + inference_topdown + visualization round trip."""

import numpy as np
import pytest

from probpose_code_tpu.apis import inference_topdown, init_model
from probpose_code_tpu.config import Config
from probpose_code_tpu.visualization import PoseLocalVisualizer


@pytest.fixture(scope="module")
def model():
    from tests.test_models.test_probpose_model import TINY_PROBPOSE_CFG

    cfg = Config.fromdict(dict(model=TINY_PROBPOSE_CFG))
    return init_model(cfg)


def test_inference_topdown(model, tmp_path):
    rng = np.random.RandomState(0)
    img = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
    bboxes = np.array([[50, 60, 250, 420], [300, 100, 500, 460]], dtype=np.float32)

    results = inference_topdown(model, img, bboxes)
    assert len(results) == 2
    for r in results:
        kpts = np.asarray(r.pred_instances.keypoints)
        assert kpts.shape == (1, 17, 2)
        scores = np.asarray(r.pred_instances.keypoint_scores)
        assert scores.shape == (1, 17)
        # ProbPose fields present
        for f in ("keypoints_probs", "keypoints_oks", "keypoints_error", "keypoints_visible"):
            assert f in r.pred_instances, f
    # keypoints decoded for bbox 0 should be near/inside its (padded) box
    kpts0 = np.asarray(results[0].pred_instances.keypoints)[0]
    assert kpts0[:, 0].mean() < 400  # roughly around the left box

    # visualization round-trip
    from probpose_code_tpu.datasets.metainfo import parse_pose_metainfo
    from probpose_code_tpu.structures import merge_data_samples

    vis = PoseLocalVisualizer()
    vis.set_dataset_meta(parse_pose_metainfo({"dataset_name": "coco"}))
    merged = merge_data_samples(results)
    out_file = str(tmp_path / "vis.jpg")
    out = vis.add_datasample("test", img, merged, kpt_thr=-1.0, out_file=out_file)
    assert out.shape == img.shape
    import os

    assert os.path.exists(out_file)
    assert not np.array_equal(out, img)  # something was drawn


def test_inference_with_image_path(model, tmp_path):
    import cv2

    rng = np.random.RandomState(1)
    img = (rng.rand(256, 320, 3) * 255).astype(np.uint8)
    path = str(tmp_path / "img.jpg")
    cv2.imwrite(path, img)
    results = inference_topdown(model, path)  # whole-image bbox
    assert len(results) == 1


def test_model_index_aliases_resolve_to_existing_configs():
    """Metafile/alias machinery (reference get_model_alias.py): every index
    entry resolves to a real config and loads."""
    import os.path as osp

    from probpose_code_tpu.apis import MODEL_INDEX, get_model_aliases, resolve_model_cfg
    from probpose_code_tpu.config import Config

    aliases = get_model_aliases()
    assert aliases["human"].startswith("rtmpose-m")
    assert "vitpose" in aliases and "wholebody" in aliases and "animal" in aliases
    for name in MODEL_INDEX:
        path = resolve_model_cfg(name)
        assert path and osp.exists(path), name
    for alias in ("human", "probpose-s", "face", "hand", "rtmo", "human3d", "hand3d"):
        path = resolve_model_cfg(alias)
        assert path and osp.exists(path), alias
        cfg = Config.fromfile(path)
        assert "model" in cfg
    assert resolve_model_cfg("not-a-model") is None


def test_init_model_accepts_alias():
    import pytest as _pytest

    from probpose_code_tpu.apis import init_model

    model = init_model("rtmpose-t")  # tiny-ish real zoo model, no weights
    assert model.head_type == "RTMCCHead"
    with _pytest.raises(FileNotFoundError):
        init_model("definitely-not-an-alias")
