"""Regression-head family: forward/loss/predict with a tiny ResNet-free CNN."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from probpose_code_tpu.datasets.metainfo import parse_pose_metainfo
from probpose_code_tpu.models import PoseModel

BASE = dict(
    type="TopdownPoseEstimator",
    data_preprocessor=dict(mean=[0, 0, 0], std=[255, 255, 255], bgr_to_rgb=False),
    backbone=dict(
        type="CSPNeXt", arch="P5", deepen_factor=0.2, widen_factor=0.125, out_indices=(4,),
    ),
    test_cfg=dict(flip_test=True),
)


def make_model(head_cfg):
    cfg = dict(BASE)
    cfg["head"] = head_cfg
    m = PoseModel(cfg, metainfo=parse_pose_metainfo({"dataset_name": "coco"}))
    m.init(input_shape=(1, 256, 192, 3))
    return m


def make_batch(b=2, seed=0):
    rng = np.random.RandomState(seed)
    return dict(
        inputs=jnp.asarray(rng.randint(0, 255, (b, 256, 192, 3)).astype(np.float32)),
        keypoint_labels=jnp.asarray(rng.rand(b, 17, 2).astype(np.float32)),
        keypoint_weights=jnp.ones((b, 17), jnp.float32),
    )


def test_regression_head():
    m = make_model(
        dict(type="RegressionHead", in_channels=128, num_joints=17,
             loss=dict(type="SmoothL1Loss", use_target_weight=True),
             decoder=dict(type="RegressionLabel", input_size=(192, 256)))
    )
    out = m.forward(m.variables, make_batch()["inputs"])
    assert out.shape == (2, 17, 2)
    total, (losses, _) = m.loss_fn(m.variables, make_batch(), rngs={"dropout": jax.random.PRNGKey(0)})
    assert np.isfinite(float(total))
    preds = m.make_predict(jit=False)(m.variables, make_batch()["inputs"])
    assert preds["keypoints"].shape == (2, 17, 2)


def test_rle_head():
    m = make_model(
        dict(type="RLEHead", in_channels=128, num_joints=17,
             loss=dict(type="RLELoss", use_target_weight=True, residual=False),
             decoder=dict(type="RegressionLabel", input_size=(192, 256)))
    )
    out = m.forward(m.variables, make_batch()["inputs"])
    assert out.shape == (2, 17, 4)
    total, (losses, _) = m.loss_fn(m.variables, make_batch(), rngs={"dropout": jax.random.PRNGKey(0)})
    assert np.isfinite(float(total))
    preds = m.make_predict(jit=False)(m.variables, make_batch()["inputs"])
    assert preds["keypoints"].shape == (2, 17, 2)
    assert preds["keypoint_scores"].shape == (2, 17)


def test_integral_head():
    m = make_model(
        dict(type="IntegralRegressionHead", in_channels=128, in_featuremap_size=(6, 8), num_joints=17,
             deconv_out_channels=(32, 32), deconv_kernel_sizes=(4, 4),
             loss=dict(type="SmoothL1Loss", use_target_weight=True),
             decoder=dict(type="IntegralRegressionLabel", input_size=(192, 256), heatmap_size=(48, 64), sigma=2.0))
    )
    coords, heatmaps = m.forward(m.variables, make_batch()["inputs"])
    assert coords.shape == (2, 17, 2)
    assert heatmaps.shape[1] == 17
    total, _ = m.loss_fn(m.variables, make_batch(), rngs={"dropout": jax.random.PRNGKey(0)})
    assert np.isfinite(float(total))
    preds = m.make_predict(jit=False)(m.variables, make_batch()["inputs"])
    assert preds["keypoints"].shape == (2, 17, 2)


def test_realnvp_log_prob():
    from probpose_code_tpu.models.utils.realnvp import RealNVP

    flow = RealNVP()
    x = jnp.asarray(np.random.RandomState(0).randn(32, 2).astype(np.float32))
    variables = flow.init(jax.random.PRNGKey(0), x)
    logp = flow.apply(variables, x)
    assert logp.shape == (32,)
    assert np.isfinite(np.asarray(logp)).all()
    # near-gaussian at init (xavier gain 0.01 -> near-identity flow)
    ref = -0.5 * (np.asarray(x) ** 2).sum(1) - np.log(2 * np.pi)
    np.testing.assert_allclose(np.asarray(logp), ref, atol=0.5)
