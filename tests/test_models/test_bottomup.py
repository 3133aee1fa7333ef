"""Bottom-up path: AE head + push/pull loss, DEKR head + SPR decode,
bottomup transforms."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import probpose_code_tpu.datasets  # noqa: F401
import probpose_code_tpu.models as M
from probpose_code_tpu.registry import MODELS, TRANSFORMS


def feats():
    return (jnp.zeros((2, 16, 16, 64)),)


def test_ae_head_and_loss():
    head = MODELS.build(
        dict(type="AssociativeEmbeddingHead", in_channels=64, num_keypoints=17,
             deconv_out_channels=(32,), deconv_kernel_sizes=(4,))
    )
    variables = head.init(jax.random.PRNGKey(0), feats())
    out = head.apply(variables, feats())
    assert out["heatmaps"].shape == (2, 17, 32, 32)
    assert out["tags"].shape == (2, 17, 32, 32)

    from probpose_code_tpu.models.losses import AssociativeEmbeddingLoss, KeypointMSELoss
    from probpose_code_tpu.models.pose_estimators.bottomup import ae_head_loss

    rng = np.random.RandomState(0)
    # padded indices: 3 instance slots, 2 valid
    kpt_idx = np.zeros((2, 3, 17, 2), dtype=np.int64)
    kpt_idx[..., 0] = rng.randint(0, 32 * 32, (2, 3, 17))
    kpt_idx[:, :2, :, 1] = 1
    batch = dict(
        heatmaps=jnp.asarray(rng.rand(2, 17, 32, 32).astype(np.float32)),
        keypoint_weights=jnp.ones((2, 17)),
        keypoint_indices=jnp.asarray(kpt_idx),
    )
    losses = ae_head_loss(out, batch, KeypointMSELoss(use_target_weight=True), AssociativeEmbeddingLoss())
    for k in ("loss_kpt", "loss_pull", "loss_push"):
        assert np.isfinite(float(losses[k])), k

    # gradient flows through tags
    def loss_of(v):
        o = head.apply(v, feats())
        ls = ae_head_loss(o, batch, KeypointMSELoss(use_target_weight=True), AssociativeEmbeddingLoss())
        return ls["loss_pull"] + ls["loss_push"] + ls["loss_kpt"]

    g = jax.grad(lambda v: loss_of(v))(variables)
    gnorm = sum(float(jnp.sum(x**2)) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gnorm)


def test_dekr_head_with_spr_decode():
    head = MODELS.build(dict(type="DEKRHead", in_channels=64, num_keypoints=17))
    variables = head.init(jax.random.PRNGKey(0), feats())
    out = head.apply(variables, feats())
    assert out["heatmaps"].shape == (2, 18, 16, 16)
    assert out["displacements"].shape == (2, 34, 16, 16)

    from probpose_code_tpu.codecs.spr import SPR

    codec = SPR(input_size=(64, 64), heatmap_size=(16, 16), sigma=(2, 1), generate_keypoint_heatmaps=True)
    kpts, scores = codec.decode(np.asarray(out["heatmaps"][0]), np.asarray(out["displacements"][0]))
    assert kpts.ndim == 3


def test_bottomup_estimator():
    cfg = dict(
        type="BottomupPoseEstimator",
        data_preprocessor=dict(mean=[0, 0, 0], std=[1, 1, 1]),
        backbone=dict(type="CSPNeXt", arch="P5", deepen_factor=0.2, widen_factor=0.125, out_indices=(2,)),
        head=dict(type="AssociativeEmbeddingHead", in_channels=32, num_keypoints=17,
                  deconv_out_channels=None, deconv_kernel_sizes=None),
    )
    from probpose_code_tpu.models.builder import build_pose_estimator

    module, aux = build_pose_estimator(cfg)
    x = jnp.zeros((1, 128, 128, 3))
    variables = module.init(jax.random.PRNGKey(0), x)
    out = module.apply(variables, x)
    assert out["heatmaps"].shape[1] == 17


def test_bottomup_transforms():
    rng = np.random.RandomState(0)
    img = (rng.rand(240, 320, 3) * 255).astype(np.uint8)
    kpts = rng.rand(2, 17, 2).astype(np.float32) * 200

    t = TRANSFORMS.build(dict(type="BottomupRandomAffine", input_size=(256, 256)))
    np.random.seed(0)
    out = t(dict(img=img.copy(), keypoints=kpts.copy(), img_shape=(240, 320)))
    assert out["img"].shape == (256, 256, 3)
    assert out["keypoints"].shape == (2, 17, 2)

    t2 = TRANSFORMS.build(dict(type="BottomupResize", input_size=(256, 256)))
    out2 = t2(dict(img=img.copy(), img_shape=(240, 320)))
    assert out2["img"].shape[0] % 32 == 0 and out2["img"].shape[1] % 32 == 0
    assert "input_center" in out2 and "input_scale" in out2
