"""DoubleProbMapHead: dual-window towers, merge semantics, loss, predict.

Parity target: reference ``mmpose/models/heads/hybrid_heads/DP_head.py``
(in/out heatmap pair, ``merge_heatmaps:693``, ``_merge_predictions:1460``,
``loss:1293``) with the DoubleProbMap codec windows.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from probpose_code_tpu.codecs import DoubleProbMap
from probpose_code_tpu.datasets.metainfo import parse_pose_metainfo
from probpose_code_tpu.models import PoseModel

TINY_DP_CFG = dict(
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
        type="DoubleProbMapHead",
        in_channels=64,
        out_channels=17,
        deconv_out_channels=(32, 32),
        deconv_kernel_sizes=(4, 4),
        keypoint_loss=dict(type="OKSHeatmapLoss", use_target_weight=True, smoothing_weight=0.05),
        probability_loss=dict(type="BCELoss", use_target_weight=True, use_sigmoid=True),
        visibility_loss=dict(type="BCELoss", use_target_weight=True, use_sigmoid=True),
        oks_loss=dict(type="MSELoss", use_target_weight=True),
        error_loss=dict(type="L1LogLoss", use_target_weight=True),
        split_heatmaps_by="in/all",
        freeze_error=True,
        freeze_oks=False,
        decoder=dict(
            type="DoubleProbMap",
            input_size=(192, 256),
            heatmap_size=(48, 64),
            sigma=-1,
            in_heatmap_padding=1.0,
            out_heatmap_padding=1.25,
        ),
    ),
    test_cfg=dict(flip_test=True, flip_mode="heatmap", shift_heatmap=False),
)


def make_batch(b=2, k=17, seed=0):
    rng = np.random.RandomState(seed)
    codec = DoubleProbMap(
        input_size=(192, 256), heatmap_size=(48, 64), sigma=-1,
        in_heatmap_padding=1.0, out_heatmap_padding=1.25,
    )
    inputs = rng.randint(0, 255, size=(b, 256, 192, 3)).astype(np.float32)
    heatmaps, out_heatmaps, weights, out_weights = [], [], [], []
    in_image, annotated, visibility, bbox_masks = [], [], [], []
    for i in range(b):
        kpts = np.stack(
            [rng.uniform(-30, 222, (1, k)), rng.uniform(-30, 286, (1, k))], axis=-1
        ).astype(np.float32)
        vis = (rng.rand(1, k) > 0.15).astype(np.float32)
        visibility_bit = (rng.rand(1, k) > 0.3).astype(np.float32) * vis
        enc = codec.encode(kpts, vis, keypoints_visibility=visibility_bit)
        heatmaps.append(enc["heatmaps"])
        out_heatmaps.append(enc["out_heatmaps"][0])
        weights.append(enc["keypoint_weights"][0])
        out_weights.append(enc["out_kpt_weights"][0])
        in_image.append(enc["in_image"][0])
        annotated.append(enc["annotated"][0])
        visibility.append(visibility_bit[0])
        mask = np.zeros((1, 256, 192), np.float32)
        mask[:, 16:240, 12:180] = 1.0
        bbox_masks.append(mask)
    return dict(
        inputs=jnp.asarray(inputs),
        heatmaps=jnp.asarray(np.stack(heatmaps)),
        out_heatmaps=jnp.asarray(np.stack(out_heatmaps)),
        keypoint_weights=jnp.asarray(np.stack(weights).astype(np.float32)),
        out_kpt_weights=jnp.asarray(np.stack(out_weights).astype(np.float32)),
        in_image=jnp.asarray(np.stack(in_image).astype(np.float32)),
        annotated=jnp.asarray(np.stack(annotated).astype(np.float32)),
        keypoints_visibility=jnp.asarray(np.stack(visibility).astype(np.float32)),
        bbox_mask=jnp.asarray(np.stack(bbox_masks)),
    )


@pytest.fixture(scope="module")
def model():
    m = PoseModel(TINY_DP_CFG, metainfo=parse_pose_metainfo({"dataset_name": "coco"}))
    m.init()
    return m


class TestDoubleProbMapHead:
    def test_forward_shapes(self, model):
        out = model.forward(model.variables, jnp.zeros((2, 256, 192, 3)))
        assert out["heatmaps"].shape == (2, 17, 64, 48)
        assert out["out_heatmaps"].shape == (2, 17, 64, 48)
        for key in ("probabilities", "visibilities", "oks", "errors"):
            assert out[key].shape == (2, 17), key
        # two distinct towers: maps must differ
        assert float(jnp.abs(out["heatmaps"] - out["out_heatmaps"]).max()) > 1e-6

    def test_loss_and_grads_reach_both_towers(self, model):
        batch = make_batch()
        rngs = {"dropout": jax.random.PRNGKey(1)}
        total, (losses, _) = model.loss_fn(model.variables, batch, rngs=rngs)
        for key in ("loss_kpt", "loss_kpt2", "loss_probability", "loss_visibility", "loss_oks", "loss_error"):
            assert key in losses and np.isfinite(float(losses[key])), key

        grads = jax.grad(
            lambda p: model.loss_fn({**model.variables, "params": p}, batch, rngs=rngs)[0]
        )(model.variables["params"])
        for tower in ("first_head", "second_head"):
            g = grads["head"][tower]
            gn = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
            assert np.isfinite(gn) and gn > 0, f"{tower} got no gradient"
        # frozen error branch receives none
        for g in jax.tree_util.tree_leaves(grads["head"]["error_layers"]):
            assert float(jnp.abs(g).max()) == 0.0

    def test_merge_selects_in_window(self):
        from probpose_code_tpu.models.pose_estimators.topdown import merge_double_heatmaps_device

        B, K, H, W = 1, 2, 8, 6
        h1 = jnp.zeros((B, K, H, W)).at[:, :, 2, 2].set(1.0)
        # k0: out-heatmap peak inside mask -> take h1; k1: peak outside -> h2
        h2 = jnp.zeros((B, K, H, W)).at[0, 0, 3, 3].set(1.0).at[0, 1, 0, 0].set(1.0)
        mask = jnp.zeros((B, 1, H, W)).at[:, :, 2:6, 2:5].set(1.0)
        merged, hout_in = merge_double_heatmaps_device(h1, h2, mask)
        assert bool(hout_in[0, 0]) and not bool(hout_in[0, 1])
        np.testing.assert_allclose(np.asarray(merged[0, 0]), np.asarray(h1[0, 0]))
        np.testing.assert_allclose(np.asarray(merged[0, 1]), np.asarray(h2[0, 1]))

    def test_predict_both_windows(self, model):
        batch = make_batch(b=2, seed=3)
        predict = model.make_predict(jit=True)
        preds = predict(model.variables, batch["inputs"])
        assert preds["keypoints"].shape == (2, 17, 2)
        assert preds["keypoint_scores"].shape == (2, 17)
        assert preds["heatmaps"].shape == (2, 17, 64, 48)
        assert preds["out_heatmaps"].shape == (2, 17, 64, 48)
        kpts = np.asarray(preds["keypoints"])
        assert np.isfinite(kpts).all()
        # out-window decode can leave the crop by up to the padding margin
        assert kpts[..., 0].min() >= -0.125 * 192 - 1 and kpts[..., 0].max() <= 192 * 1.125 + 1

    def test_predict_no_flip_matches_host_codec(self, model):
        batch = make_batch(b=1, seed=4)
        predict = model.make_predict(flip_test=False, jit=False)
        preds = predict(model.variables, batch["inputs"])
        out = model.forward(model.variables, batch["inputs"])
        codec = DoubleProbMap(
            input_size=(192, 256), heatmap_size=(48, 64), sigma=-1,
            in_heatmap_padding=1.0, out_heatmap_padding=1.25,
        )
        kpts_in, _ = codec.decode(np.asarray(out["heatmaps"][0]), htm_type="in")
        kpts_out, _ = codec.decode(np.asarray(out["out_heatmaps"][0]), htm_type="out")
        # device merge: out-decode inside crop -> in-window result, else out
        dev = np.asarray(preds["keypoints"][0])
        inside = (
            (kpts_out[0, :, 0] >= 0) & (kpts_out[0, :, 0] < 192)
            & (kpts_out[0, :, 1] >= 0) & (kpts_out[0, :, 1] < 256)
        )
        expect = np.where(inside[:, None], kpts_in[0], kpts_out[0])
        np.testing.assert_allclose(dev, expect, atol=0.05)


def test_dp_config_one_train_step():
    """The shipped DoubleProbPose config builds and runs one optimizer step."""
    import pathlib

    import optax

    from probpose_code_tpu.config import Config

    cfg_path = (
        pathlib.Path(__file__).parent.parent.parent
        / "configs/body_2d_keypoint/topdown_probmap/coco/td-dpm_DoubleProbPose-small_8xb64-210e_coco-256x192.py"
    )
    cfg = Config.fromfile(str(cfg_path))
    assert cfg.model["head"]["type"] == "DoubleProbMapHead"
    assert "temperature" not in cfg.model["head"], "_delete_ merge failed"
    model_cfg = dict(cfg.model)
    model_cfg["backbone"] = dict(model_cfg["backbone"])
    model_cfg["backbone"]["arch"] = {
        "embed_dims": 64, "num_layers": 2, "num_heads": 4, "feedforward_channels": 128}
    model_cfg["head"] = dict(model_cfg["head"])
    model_cfg["head"]["in_channels"] = 64
    model_cfg["head"]["deconv_out_channels"] = (32, 32)
    m = PoseModel(model_cfg, metainfo=parse_pose_metainfo({"dataset_name": "coco"}))
    m.init()
    batch = make_batch(b=2)
    tx = optax.adam(1e-3)
    opt_state = tx.init(m.variables["params"])
    (total, _), grads = jax.value_and_grad(
        lambda p: m.loss_fn({**m.variables, "params": p}, batch, rngs={"dropout": jax.random.PRNGKey(0)}),
        has_aux=True,
    )(m.variables["params"])
    updates, _ = tx.update(grads, opt_state, m.variables["params"])
    params = optax.apply_updates(m.variables["params"], updates)
    total2, _ = m.loss_fn({**m.variables, "params": params}, batch, rngs={"dropout": jax.random.PRNGKey(0)})
    assert np.isfinite(float(total)) and np.isfinite(float(total2))
