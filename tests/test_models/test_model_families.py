"""Second/third model families: HRNet+UDP and RTMPose (CSPNeXt+GAU+SimCC).

Scaled-down variants (same topology) exercising forward, loss, and the
jitted predict program with the codec-appropriate decode.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from probpose_code_tpu.datasets.metainfo import parse_pose_metainfo
from probpose_code_tpu.models import PoseModel

TINY_HRNET_CFG = dict(
    type="TopdownPoseEstimator",
    data_preprocessor=dict(mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], bgr_to_rgb=True),
    backbone=dict(
        type="HRNet",
        in_channels=3,
        extra=dict(
            stage1=dict(num_modules=1, num_branches=1, block="BOTTLENECK", num_blocks=(1,), num_channels=(16,)),
            stage2=dict(num_modules=1, num_branches=2, block="BASIC", num_blocks=(1, 1), num_channels=(8, 16)),
            stage3=dict(num_modules=1, num_branches=3, block="BASIC", num_blocks=(1, 1, 1), num_channels=(8, 16, 32)),
            stage4=dict(
                num_modules=1, num_branches=4, block="BASIC", num_blocks=(1, 1, 1, 1), num_channels=(8, 16, 32, 64)
            ),
        ),
    ),
    head=dict(
        type="HeatmapHead",
        in_channels=8,
        out_channels=17,
        deconv_out_channels=None,
        deconv_kernel_sizes=None,
        loss=dict(type="KeypointMSELoss", use_target_weight=True),
        decoder=dict(type="UDPHeatmap", input_size=(192, 256), heatmap_size=(48, 64), sigma=2),
    ),
    test_cfg=dict(flip_test=True, shift_heatmap=False),
)

TINY_RTMPOSE_CFG = dict(
    type="TopdownPoseEstimator",
    data_preprocessor=dict(mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], bgr_to_rgb=True),
    backbone=dict(
        type="CSPNeXt",
        arch="P5",
        expand_ratio=0.5,
        deepen_factor=0.2,
        widen_factor=0.25,
        out_indices=(4,),
        channel_attention=True,
    ),
    head=dict(
        type="RTMCCHead",
        in_channels=256,
        out_channels=17,
        input_size=(192, 256),
        in_featuremap_size=(6, 8),
        simcc_split_ratio=2.0,
        final_layer_kernel_size=7,
        gau_cfg=dict(hidden_dims=64, s=32, expansion_factor=2, act_fn="SiLU", use_rel_bias=False, pos_enc=False),
        loss=dict(type="KLDiscretLoss", use_target_weight=True, beta=10.0, label_softmax=True),
        decoder=dict(
            type="SimCCLabel", input_size=(192, 256), sigma=(4.9, 5.66), simcc_split_ratio=2.0, normalize=False
        ),
    ),
    test_cfg=dict(flip_test=True),
)


def make_inputs(b=2, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randint(0, 255, size=(b, 256, 192, 3)).astype(np.float32))


class TestHRNetUDP:
    @pytest.fixture(scope="class")
    def model(self):
        m = PoseModel(TINY_HRNET_CFG, metainfo=parse_pose_metainfo({"dataset_name": "coco"}))
        m.init()
        return m

    def test_forward(self, model):
        out = model.forward(model.variables, make_inputs())
        assert out.shape == (2, 17, 64, 48)

    def test_loss(self, model):
        rng = np.random.RandomState(1)
        batch = dict(
            inputs=make_inputs(),
            heatmaps=jnp.asarray(rng.rand(2, 17, 64, 48).astype(np.float32)),
            keypoint_weights=jnp.ones((2, 17)),
        )
        total, (losses, _) = model.loss_fn(model.variables, batch, rngs={"dropout": jax.random.PRNGKey(0)})
        assert np.isfinite(float(total))
        assert "loss_kpt" in losses and "acc_pose" in losses

    def test_predict(self, model):
        predict = model.make_predict(jit=True)
        preds = predict(model.variables, make_inputs())
        assert preds["keypoints"].shape == (2, 17, 2)
        assert np.isfinite(np.asarray(preds["keypoints"])).all()


class TestRTMPose:
    @pytest.fixture(scope="class")
    def model(self):
        m = PoseModel(TINY_RTMPOSE_CFG, metainfo=parse_pose_metainfo({"dataset_name": "coco"}))
        m.init()
        return m

    def test_forward(self, model):
        pred_x, pred_y = model.forward(model.variables, make_inputs())
        assert pred_x.shape == (2, 17, 384)
        assert pred_y.shape == (2, 17, 512)

    def test_loss(self, model):
        from probpose_code_tpu.codecs import SimCCLabel

        codec = SimCCLabel(input_size=(192, 256), sigma=(4.9, 5.66), simcc_split_ratio=2.0, normalize=False)
        rng = np.random.RandomState(2)
        kpts = np.stack(
            [rng.uniform(20, 170, (2, 17)), rng.uniform(20, 230, (2, 17))], axis=-1
        ).astype(np.float32)
        xs, ys, ws = [], [], []
        for i in range(2):
            enc = codec.encode(kpts[i:i + 1], np.ones((1, 17), np.float32))
            xs.append(enc["keypoint_x_labels"][0])
            ys.append(enc["keypoint_y_labels"][0])
            ws.append(enc["keypoint_weights"][0])
        batch = dict(
            inputs=make_inputs(seed=2),
            keypoint_x_labels=jnp.asarray(np.stack(xs)),
            keypoint_y_labels=jnp.asarray(np.stack(ys)),
            keypoint_weights=jnp.asarray(np.stack(ws).astype(np.float32)),
        )
        total, (losses, _) = model.loss_fn(model.variables, batch, rngs={"dropout": jax.random.PRNGKey(0)})
        assert np.isfinite(float(total))
        assert "acc_pose" in losses

    def test_predict_decode_matches_host_codec(self, model):
        from probpose_code_tpu.codecs import SimCCLabel

        predict = model.make_predict(flip_test=False, jit=True)
        preds = predict(model.variables, make_inputs(seed=3))
        assert preds["keypoints"].shape == (2, 17, 2)

        codec = SimCCLabel(input_size=(192, 256), sigma=(4.9, 5.66), simcc_split_ratio=2.0, normalize=False)
        kpts_host, scores_host = codec.decode(
            np.asarray(preds["keypoint_x_labels"]), np.asarray(preds["keypoint_y_labels"])
        )
        np.testing.assert_allclose(np.asarray(preds["keypoints"]), kpts_host, atol=1e-4)
        np.testing.assert_allclose(np.asarray(preds["keypoint_scores"]), scores_host, atol=1e-5)
