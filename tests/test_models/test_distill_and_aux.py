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
