"""End-to-end model tests: build ProbPose-S from config, forward, loss, grads.

Follows the reference estimator-test pattern (synthetic batches, real shipped
configs — tests/test_models/test_pose_estimators/test_topdown.py) but runs
the jitted device programs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from probpose_code_tpu.datasets.metainfo import parse_pose_metainfo
from probpose_code_tpu.models import PoseModel

# a scaled-down ProbPose-S (2 ViT layers) so CPU tests stay fast; same
# topology otherwise
TINY_PROBPOSE_CFG = dict(
    type="TopdownPoseEstimator",
    data_preprocessor=dict(
        type="PoseDataPreprocessor",
        mean=[123.675, 116.28, 103.53],
        std=[58.395, 57.12, 57.375],
        bgr_to_rgb=True,
    ),
    backbone=dict(
        type="mmpretrain.VisionTransformer",
        arch={"embed_dims": 64, "num_layers": 2, "num_heads": 4, "feedforward_channels": 256},
        img_size=(256, 192),
        patch_size=16,
        qkv_bias=True,
        drop_path_rate=0.1,
        with_cls_token=False,
        out_type="featmap",
        patch_cfg=dict(padding=2),
        init_cfg=None,
    ),
    head=dict(
        type="ProbMapHead",
        in_channels=64,
        out_channels=17,
        deconv_out_channels=(32, 32),
        deconv_kernel_sizes=(4, 4),
        keypoint_loss=dict(type="OKSHeatmapLoss", use_target_weight=True, smoothing_weight=0.05),
        probability_loss=dict(type="BCELoss", use_target_weight=True, use_sigmoid=True),
        visibility_loss=dict(type="BCELoss", use_target_weight=True, use_sigmoid=True),
        oks_loss=dict(type="MSELoss", use_target_weight=True),
        error_loss=dict(type="L1LogLoss", use_target_weight=True),
        normalize=1.0,
        freeze_error=True,
        freeze_oks=False,
        decoder=dict(type="ProbMap", input_size=(192, 256), heatmap_size=(48, 64), sigma=-1),
    ),
    test_cfg=dict(flip_test=True, flip_mode="heatmap", shift_heatmap=False),
)


def make_batch(b=2, k=17, seed=0):
    rng = np.random.RandomState(seed)
    from probpose_code_tpu.codecs import ProbMap

    codec = ProbMap(input_size=(192, 256), heatmap_size=(48, 64), sigma=-1)
    inputs = rng.randint(0, 255, size=(b, 256, 192, 3)).astype(np.float32)
    heatmaps, weights, in_image, annotated, visibility = [], [], [], [], []
    for i in range(b):
        kpts = np.stack(
            [rng.uniform(-20, 212, (1, k)), rng.uniform(-20, 276, (1, k))], axis=-1
        ).astype(np.float32)
        vis = (rng.rand(1, k) > 0.15).astype(np.float32)
        visibility_bit = (rng.rand(1, k) > 0.3).astype(np.float32) * vis
        enc = codec.encode(kpts, vis, keypoints_visibility=visibility_bit)
        heatmaps.append(enc["heatmaps"])
        weights.append(enc["keypoint_weights"][0])
        in_image.append(enc["in_image"][0])
        annotated.append(enc["annotated"][0])
        visibility.append(visibility_bit[0])
    return dict(
        inputs=jnp.asarray(inputs),
        heatmaps=jnp.asarray(np.stack(heatmaps)),
        keypoint_weights=jnp.asarray(np.stack(weights).astype(np.float32)),
        in_image=jnp.asarray(np.stack(in_image).astype(np.float32)),
        annotated=jnp.asarray(np.stack(annotated).astype(np.float32)),
        keypoints_visibility=jnp.asarray(np.stack(visibility).astype(np.float32)),
    )


@pytest.fixture(scope="module")
def model():
    m = PoseModel(TINY_PROBPOSE_CFG, metainfo=parse_pose_metainfo({"dataset_name": "coco"}))
    m.init()
    return m


class TestProbPoseModel:
    def test_forward_shapes(self, model):
        images = jnp.zeros((2, 256, 192, 3))
        out = model.forward(model.variables, images)
        assert out["heatmaps"].shape == (2, 17, 64, 48)
        for key in ("probabilities", "visibilities", "oks", "errors"):
            assert out[key].shape == (2, 17), key
        # sparsemax heatmaps: rows on the simplex scaled by normalize=1
        s = np.asarray(out["heatmaps"]).reshape(2, 17, -1).sum(-1)
        np.testing.assert_allclose(s, 1.0, atol=1e-4)

    def test_loss_and_grads(self, model):
        batch = make_batch()
        rngs = {"dropout": jax.random.PRNGKey(1)}

        def scalar_loss(params):
            variables = {**model.variables, "params": params}
            total, _ = model.loss_fn(variables, batch, rngs=rngs)
            return total

        total, (losses, new_state) = model.loss_fn(model.variables, batch, rngs=rngs)
        for key in ("loss_kpt", "loss_probability", "loss_visibility", "loss_oks", "loss_error"):
            assert key in losses, key
            assert np.isfinite(float(losses[key])), key
        assert "batch_stats" in new_state

        grads = jax.grad(scalar_loss)(model.variables["params"])
        gnorm = sum(float(jnp.sum(g**2)) for g in jax.tree_util.tree_leaves(grads)) ** 0.5
        assert np.isfinite(gnorm) and gnorm > 0
        # frozen error branch must receive no gradient
        err_grads = grads["head"]["error_layers"]
        for g in jax.tree_util.tree_leaves(err_grads):
            assert float(jnp.abs(g).max()) == 0.0

    def test_predict_program(self, model):
        batch = make_batch(b=2, seed=3)
        predict = model.make_predict(jit=True)
        preds = predict(model.variables, batch["inputs"])
        assert preds["keypoints"].shape == (2, 17, 2)
        assert preds["keypoint_scores"].shape == (2, 17)
        for key in ("keypoints_probs", "keypoints_visible", "keypoints_oks", "keypoints_error"):
            assert preds[key].shape == (2, 17)
        kpts = np.asarray(preds["keypoints"])
        assert np.isfinite(kpts).all()
        # decoded keypoints live in input space
        assert kpts[..., 0].min() > -96 and kpts[..., 0].max() < 192 + 96

    def test_predict_no_flip_matches_manual(self, model):
        batch = make_batch(b=1, seed=4)
        predict = model.make_predict(flip_test=False, jit=False)
        preds = predict(model.variables, batch["inputs"])
        # manual: forward + host codec decode must agree with device program
        out = model.forward(model.variables, batch["inputs"])
        from probpose_code_tpu.codecs import ProbMap

        codec = ProbMap(input_size=(192, 256), heatmap_size=(48, 64), sigma=-1)
        kpts_host, scores_host = codec.decode(np.asarray(out["heatmaps"][0]))
        np.testing.assert_allclose(np.asarray(preds["keypoints"][0]), kpts_host[0], atol=0.05)
        np.testing.assert_allclose(np.asarray(preds["keypoints_conf"][0]), scores_host[0], atol=1e-4)
