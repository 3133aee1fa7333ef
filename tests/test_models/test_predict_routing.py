"""Every head family must route through ``make_predict`` — the single
program ``runner.val``, ``inference_topdown`` and ``inference_bottomup``
drive. Guards the round-3 gap where bottomup/lifter/wrapper heads trained
fine but crashed at predict time."""

import numpy as np
import pytest

from probpose_code_tpu.datasets.metainfo import parse_pose_metainfo
from probpose_code_tpu.models import PoseModel

COCO = parse_pose_metainfo({"dataset_name": "coco"})


def _predict(cfg, metainfo=COCO, shape=(2, 64, 64, 3)):
    m = PoseModel(cfg, metainfo=metainfo)
    m.init(input_shape=(1,) + shape[1:])
    out = m.make_predict(jit=False)(m.variables, np.zeros(shape, np.uint8))
    assert isinstance(out, dict) and "keypoints" in out
    return out


def test_vispredict_head_predict_and_loss():
    import jax

    cfg = dict(
        type="TopdownPoseEstimator",
        backbone=dict(type="ResNet", depth=18),
        head=dict(
            type="VisPredictHead",
            loss=dict(type="BCELoss", use_target_weight=False, use_sigmoid=False),
            pose_cfg=dict(type="HeatmapHead", in_channels=512, out_channels=17,
                          loss=dict(type="KeypointMSELoss", use_target_weight=True),
                          decoder=dict(type="MSRAHeatmap", input_size=(64, 64),
                                       heatmap_size=(16, 16), sigma=1)),
        ),
        test_cfg=dict(flip_test=True),
    )
    out = _predict(cfg)
    assert out["keypoints_visible"].shape == (2, 17)

    m = PoseModel(cfg, metainfo=COCO)
    m.init(input_shape=(1, 64, 64, 3))
    batch = dict(inputs=np.zeros((2, 64, 64, 3), np.uint8),
                 heatmaps=np.zeros((2, 17, 16, 16), np.float32),
                 keypoint_weights=np.ones((2, 17), np.float32),
                 annotated=np.ones((2, 17), np.float32))
    total, (losses, _) = jax.jit(m.loss_fn)(m.variables, batch)
    assert "loss_vis" in losses and np.isfinite(float(total))


def test_internet_head_predict():
    codec = dict(type="Hand3DHeatmap", image_size=[64, 64], heatmap_size=[16, 16, 16],
                 depth_size=16, root_heatmap_size=16)
    cfg = dict(
        type="TopdownPoseEstimator",
        backbone=dict(type="ResNet", depth=18),
        head=dict(type="InternetHead", in_channels=512, num_keypoints=42,
                  depth_size=16, root_heatmap_size=16, deconv_out_channels=(64,),
                  decoder=codec),
        test_cfg=dict(flip_test=False, input_size=(64, 64)),
    )
    out = _predict(cfg, metainfo=parse_pose_metainfo({"dataset_name": "interhand3d"}))
    assert out["keypoints"].shape == (2, 42, 3)
    assert out["rel_root_depth"].shape == (2,)
    assert out["hand_type"].shape == (2, 2)
    assert (np.asarray(out["hand_type"]) >= 0).all() and (np.asarray(out["hand_type"]) <= 1).all()


@pytest.mark.parametrize("flip", [False, True])
def test_lifter_predict(flip):
    # DSTFormer layout supports the MotionBERT flip-TTA protocol
    cfg = dict(
        type="PoseLifter",
        backbone=dict(type="DSTFormer", in_channels=3, feat_size=32, depth=1,
                      num_heads=2, mlp_ratio=2, seq_len=9, num_joints=17),
        head=dict(type="MotionRegressionHead", in_channels=32, embedding_size=32,
                  decoder=dict(type="MotionBERTLabel", num_keypoints=17)),
        test_cfg=dict(flip_test=flip),
    )
    m = PoseModel(cfg, metainfo=parse_pose_metainfo({"dataset_name": "h36m"}))
    m.init(input_shape=(1, 9, 17, 3))
    out = m.make_predict(jit=False)(m.variables, np.zeros((2, 9, 17, 3), np.float32))
    assert out["keypoints_3d"].shape == (2, 9, 17, 3)
