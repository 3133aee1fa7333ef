"""DWPose distillation, BatchSyncRandomResize, misc utils."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import probpose_code_tpu.models as M


def _simcc_cfg(widen):
    codec = dict(type="SimCCLabel", input_size=(64, 64), sigma=(4.9, 5.66),
                 simcc_split_ratio=2.0, normalize=False, use_dark=False)
    return dict(
        type="TopdownPoseEstimator",
        data_preprocessor=dict(mean=[0, 0, 0], std=[1, 1, 1]),
        backbone=dict(type="CSPNeXt", arch="P5", deepen_factor=0.33, widen_factor=widen, out_indices=(4,)),
        head=dict(type="RTMCCHead", in_channels=int(1024 * widen), out_channels=17,
                  input_size=(64, 64), in_featuremap_size=(2, 2), simcc_split_ratio=2.0,
                  gau_cfg=dict(hidden_dims=64, s=32, expansion_factor=2, use_rel_bias=False, pos_enc=False),
                  loss=dict(type="KLDiscretLoss", use_target_weight=True, beta=10.0, label_softmax=True),
                  decoder=codec),
        test_cfg=dict(flip_test=False),
    )


def test_dwpose_distiller_loss_and_anneal():
    dis = M.DWPoseDistiller(
        teacher_cfg=_simcc_cfg(0.5), student_cfg=_simcc_cfg(0.25),
        distill_cfg=[dict(methods=[dict(type="KDLoss", name="loss_logit", weight=1.0)])],
    )
    dis.init(input_shape=(2, 64, 64, 3))
    rng = np.random.RandomState(0)
    batch = dict(
        inputs=jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32) * 255),
        keypoint_x_labels=jnp.asarray(rng.rand(2, 17, 128).astype(np.float32)),
        keypoint_y_labels=jnp.asarray(rng.rand(2, 17, 128).astype(np.float32)),
        keypoint_weights=jnp.ones((2, 17), jnp.float32),
    )
    t0, (l0, _) = dis.loss_fn(dis.student.variables, batch, epoch=0, max_epochs=60)
    t1, (l1, _) = dis.loss_fn(dis.student.variables, batch, epoch=30, max_epochs=60)
    assert np.isfinite(float(t0))
    # KD term anneals with epoch: epoch 30/60 -> half the weight
    np.testing.assert_allclose(float(l1["loss_logit"]), float(l0["loss_logit"]) * 0.5, rtol=1e-5)
    # gradient flows into the student
    g = jax.grad(lambda v: dis.loss_fn(v, batch, 0, 60)[0])(dis.student.variables)
    gn = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g["params"]))
    assert gn > 0


def test_batch_sync_random_resize():
    from probpose_code_tpu.models.data_preprocessors import BatchSyncRandomResize

    aug = BatchSyncRandomResize((128, 256), interval=1, size_divisor=32)
    b = dict(inputs=np.zeros((2, 96, 96, 3), np.float32),
             gt_bboxes=np.ones((2, 3, 4)) * 10,
             gt_keypoints=np.ones((2, 3, 17, 2)) * 10,
             gt_areas=np.ones((2, 3)) * 100)
    out = aug(b, step=0)
    h = out["inputs"].shape[1]
    assert h % 32 == 0 and 128 <= h <= 256
    scale = h / 96
    np.testing.assert_allclose(out["gt_bboxes"][0, 0, 0], 10 * scale)
    np.testing.assert_allclose(out["gt_areas"][0, 0], 100 * scale * scale)


def test_stopwatch_and_env():
    import time

    from probpose_code_tpu.utils import StopWatch, collect_env

    sw = StopWatch(window=3)
    with sw.timeit("x"):
        time.sleep(0.002)
    rep = sw.report()
    assert rep["x"] > 0
    env = collect_env()
    assert "JAX" in env and "NumPy" in env


def test_rtmw_model_from_config():
    from probpose_code_tpu.config import Config
    from probpose_code_tpu.models import PoseModel

    cfg = Config.fromfile(
        "configs/wholebody_2d_keypoint/rtmpose/cocktail14/rtmw-m_8xb1024-270e_cocktail14-256x192.py"
    )
    model = PoseModel(cfg["model"], metainfo=None)
    model.init(input_shape=(1, 256, 192, 3))
    px, py = model.forward(model.variables, jnp.zeros((1, 256, 192, 3)))
    assert px.shape == (1, 133, 384) and py.shape == (1, 133, 512)


def test_cid_head_loss_and_predict():
    import jax.random as jr

    from probpose_code_tpu.models.heads.cid_head import cid_device_predict, cid_head_loss
    from probpose_code_tpu.models.losses import FocalHeatmapLoss, InfoNCELoss

    bb = M.ResNet(depth=18, out_indices=(1,))
    head = M.CIDHead(in_channels=128, gfd_channels=32, num_keypoints=17)
    est = M.BottomupPoseEstimator(backbone=bb, head=head)
    x = jnp.zeros((2, 128, 128, 3))

    def init_fn(module, xx):
        out = module(xx, train=False)
        module.head.forward_instances(out["feats"], jnp.zeros((4, 2), jnp.int32), jnp.zeros(4, jnp.int32))
        return out

    vs = est.init(jr.PRNGKey(0), x, method=init_fn)
    out = est.apply(vs, x)
    H, W = out["heatmaps"].shape[2:]
    rng = np.random.RandomState(0)
    Mi, K = 4, 17
    batch = dict(
        heatmaps=jnp.asarray(rng.rand(2, K + 1, H, W).astype(np.float32)),
        instance_coords=jnp.asarray(rng.randint(0, min(H, W), (2, Mi, 2)), jnp.int32),
        instance_valid=jnp.asarray(np.array([[1, 1, 0, 0], [1, 0, 0, 0]], bool)),
        instance_heatmaps=jnp.asarray(rng.rand(2, Mi, K, H, W).astype(np.float32)),
        keypoint_weights=jnp.ones((2, Mi, K), jnp.float32),
    )
    fwd = lambda f, c, i: est.apply(vs, f, c, i, method=lambda m, ff, cc, ii: m.head.forward_instances(ff, cc, ii))
    losses = cid_head_loss(out, batch, fwd, dict(
        coupled=FocalHeatmapLoss(), decoupled=FocalHeatmapLoss(use_target_weight=True),
        contrastive=InfoNCELoss(temperature=0.05, loss_weight=1.0)))
    assert all(np.isfinite(float(v)) for v in losses.values())
    pred = cid_device_predict(out, fwd, max_instances=5)
    assert pred["keypoints"].shape == (2, 5, 17, 2)


def test_pose_data_preprocessor_registered():
    """PoseDataPreprocessor as a registered, jit-safe normalize stage
    (reference ``data_preprocessor.py:14-105``)."""
    from probpose_code_tpu.registry import MODELS

    p = MODELS.build(dict(type="PoseDataPreprocessor", mean=[10.0, 20.0, 30.0],
                          std=[2.0, 2.0, 2.0], bgr_to_rgb=True, pad_size_divisor=32))
    img = np.zeros((1, 60, 60, 3), np.uint8)
    img[..., 0] = 30  # B channel -> lands in the last slot after the flip
    out = np.asarray(p(img))
    assert out.shape == (1, 64, 64, 3)  # padded to divisor
    # flipped pixel (0, 0, 30): ((0-10)/2, (0-20)/2, (30-30)/2)
    np.testing.assert_allclose(out[0, 0, 0], [-5.0, -10.0, 0.0])


def test_frozen_batchnorm_stops_gradients():
    """FrozenBatchNorm2d: affine params receive zero gradient and running
    stats are applied even in train mode (reference ``models/utils/misc.py``)."""
    import jax
    import jax.numpy as jnp
    from probpose_code_tpu.models.backbones.resnet import FrozenBatchNorm2d

    m = FrozenBatchNorm2d()
    x = jnp.arange(24, dtype=jnp.float32).reshape(1, 2, 3, 4)
    vs = m.init(jax.random.PRNGKey(0), x)

    def loss(params):
        return jnp.sum(m.apply({"params": params, "batch_stats": vs["batch_stats"]}, x) ** 2)

    g = jax.grad(loss)(vs["params"])
    assert all(float(jnp.abs(v).max()) == 0.0 for v in jax.tree_util.tree_leaves(g))
    # identity stats -> output equals input
    np.testing.assert_allclose(np.asarray(m.apply(vs, x)), np.asarray(x), rtol=1e-4)


def test_resnet_frozen_norm_cfg():
    """ResNet(norm_cfg=FrozenBatchNorm2d) builds and its BN params are
    gradient-isolated (EDPose fine-tuning recipe surface)."""
    import jax
    import jax.numpy as jnp
    from probpose_code_tpu.registry import MODELS

    bb = MODELS.build(dict(type="ResNet", depth=18, out_indices=(3,),
                           norm_cfg=dict(type="FrozenBatchNorm2d", requires_grad=False)))
    x = jnp.zeros((1, 64, 64, 3))
    vs = bb.init(jax.random.PRNGKey(0), x, train=True)

    def loss(params):
        (out,) = bb.apply({"params": params, **{k: v for k, v in vs.items() if k != "params"}},
                          x + 1.0, train=True)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(vs["params"])
    flat = jax.tree_util.tree_flatten_with_path(g)[0]
    bn_grads = [v for k, v in flat if "bn" in jax.tree_util.keystr(k)]
    assert bn_grads and all(float(jnp.abs(v).max()) == 0.0 for v in bn_grads)
