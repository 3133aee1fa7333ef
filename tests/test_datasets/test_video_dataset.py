"""PoseTrack18VideoDataset: multi-frame sampling + pipeline integration,
and the collect_multi_frames API."""

import json
import os

import numpy as np
import pytest

import cv2

from probpose_code_tpu.apis import collect_multi_frames
from probpose_code_tpu.datasets import Compose, PoseTrack18VideoDataset


@pytest.fixture(scope="module")
def video_dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("posetrack")
    seq_dir = root / "images" / "val" / "000001_mpii"
    seq_dir.mkdir(parents=True)
    nframes = 8
    rng = np.random.RandomState(0)
    for i in range(nframes):
        cv2.imwrite(str(seq_dir / f"{i:06d}.jpg"), (rng.rand(128, 96, 3) * 255).astype(np.uint8))

    images, annotations = [], []
    for i in range(2, 5):  # center frames with annotations
        img_id = 100 + i
        images.append(dict(
            id=img_id, frame_id=img_id, nframes=nframes,
            file_name=f"images/val/000001_mpii/{i:06d}.jpg",
            width=96, height=128,
        ))
        kpts = np.zeros((17, 3), np.float32)
        kpts[:, 0] = rng.uniform(10, 80, 17)
        kpts[:, 1] = rng.uniform(10, 110, 17)
        kpts[:, 2] = 2
        annotations.append(dict(
            id=1000 + i, image_id=img_id, category_id=1, iscrowd=0,
            bbox=[5, 5, 85, 115], area=85 * 115, num_keypoints=17,
            keypoints=kpts.reshape(-1).tolist(),
        ))
    ann = dict(
        images=images, annotations=annotations,
        categories=[dict(id=1, name="person")],
    )
    (root / "annotations").mkdir()
    with open(root / "annotations" / "val.json", "w") as f:
        json.dump(ann, f)
    return str(root)


def test_random_sampling_train(video_dataset_root):
    ds = PoseTrack18VideoDataset(
        ann_file="annotations/val.json",
        data_root=video_dataset_root,
        data_prefix=dict(img=""),
        frame_weights=[0.0, 1.0],
        frame_sampler_mode="random",
        frame_range=2,
        num_sampled_frame=1,
        pipeline=[dict(type="LoadImage")],
    )
    assert len(ds) == 3
    info = ds.get_data_info(0)
    assert isinstance(info["img_path"], list) and len(info["img_path"]) == 2
    np.testing.assert_allclose(info["frame_weights"], [0.0, 1.0])
    out = ds[0]
    assert isinstance(out["img"], list) and len(out["img"]) == 2
    assert out["img"][0].shape == (128, 96, 3)


def test_fixed_sampling_test_mode_and_affine(video_dataset_root):
    ds = PoseTrack18VideoDataset(
        ann_file="annotations/val.json",
        data_root=video_dataset_root,
        data_prefix=dict(img=""),
        frame_weights=[0.2, 0.2, 0.2, 0.2, 0.2],
        frame_sampler_mode="fixed",
        frame_indices=[-2, -1, 0, 1, 2],
        test_mode=True,
        pipeline=[
            dict(type="LoadImage"),
            dict(type="GetBBoxCenterScale"),
            dict(type="TopdownAffine", input_size=(192, 256)),
            dict(type="PackPoseInputs"),
        ],
    )
    info = ds.get_data_info(0)
    # test mode keeps the center frame (added first) and skips idx==0
    assert len(info["img_path"]) == 5
    out = ds[0]
    imgs = out["inputs"]
    # all frames warped to the crop size
    assert isinstance(imgs, (list, np.ndarray))
    arr = np.asarray(imgs)
    assert arr.shape[-3:] == (256, 192, 3) and arr.shape[0] == 5


def test_collect_multi_frames():
    video = [np.full((4, 4, 3), i, np.uint8) for i in range(10)]
    frames = collect_multi_frames(video, frame_id=5, indices=[-2, 0, 2])
    assert len(frames) == 3
    assert frames[0][0, 0, 0] == 5  # current first
    assert frames[1][0, 0, 0] == 3
    assert frames[2][0, 0, 0] == 7
    online = collect_multi_frames(video, frame_id=5, indices=[-2, 2], online=True)
    assert online[2][0, 0, 0] == 5  # future clipped to current


def test_posewarper_multiframe_forward_and_loss():
    """Multi-frame clip (B, T, H, W, 3) through backbone-per-frame +
    PoseWarperNeck alignment + heatmap head; loss + grads flow."""
    import jax
    import jax.numpy as jnp

    from probpose_code_tpu.datasets.metainfo import parse_pose_metainfo
    from probpose_code_tpu.models import PoseModel

    cfg = dict(
        type="TopdownPoseEstimator",
        data_preprocessor=dict(mean=[0, 0, 0], std=[255, 255, 255]),
        backbone=dict(type="ResNet", depth=18, out_indices=(3,)),
        neck=dict(type="PoseWarperNeck", in_channels=512, out_channels=64, inner_channels=32,
                  dilations=(3, 6), num_res_blocks=2),
        head=dict(
            type="HeatmapHead", in_channels=64, out_channels=17,
            deconv_out_channels=(32, 32), deconv_kernel_sizes=(4, 4),
            loss=dict(type="KeypointMSELoss", use_target_weight=True),
            decoder=dict(type="MSRAHeatmap", input_size=(96, 128), heatmap_size=(12, 16), sigma=2),
        ),
        test_cfg=dict(flip_test=False),
    )
    m = PoseModel(cfg, metainfo=parse_pose_metainfo({"dataset_name": "posetrack18"}))
    # init through the multi-frame path so the neck params exist
    rng = np.random.RandomState(0)
    clips = jnp.asarray(rng.rand(2, 3, 128, 96, 3).astype(np.float32) * 255)
    m.init(input_shape=(1, 3, 128, 96, 3))
    out = m.forward(m.variables, clips)
    assert out.shape == (2, 17, 16, 12)

    batch = dict(
        inputs=clips,
        heatmaps=jnp.asarray(rng.rand(2, 17, 16, 12).astype(np.float32)),
        keypoint_weights=jnp.ones((2, 17), jnp.float32),
    )
    total, (losses, _) = m.loss_fn(m.variables, batch, rngs={"dropout": jax.random.PRNGKey(0)})
    assert np.isfinite(float(total))
    grads = jax.grad(lambda p: m.loss_fn({**m.variables, "params": p}, batch,
                                         rngs={"dropout": jax.random.PRNGKey(0)})[0])(m.variables["params"])
    for part in ("neck", "backbone"):
        gn = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads[part]))
        assert np.isfinite(gn) and gn > 0, part
