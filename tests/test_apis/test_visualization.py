"""PoseLocalVisualizer rendering modes: mmpose/openpose skeletons, heatmap
draw types (featmap / p_area / contours), keypoint indices, 3D panel."""

import numpy as np
import pytest

from probpose_code_tpu.datasets.metainfo import parse_pose_metainfo
from probpose_code_tpu.visualization import Pose3dLocalVisualizer, PoseLocalVisualizer


@pytest.fixture()
def vis():
    v = PoseLocalVisualizer()
    v.set_dataset_meta(parse_pose_metainfo({"dataset_name": "coco"}))
    return v


def _pose(n=2, seed=0):
    rng = np.random.RandomState(seed)
    kpts = rng.rand(n, 17, 2) * np.array([180, 230]) + 10
    scores = np.clip(rng.rand(n, 17) + 0.3, 0, 1)
    return kpts.astype(np.float32), scores.astype(np.float32)


def test_mmpose_style_and_kpt_idx(vis):
    img = np.zeros((256, 192, 3), np.uint8)
    kpts, scores = _pose()
    out = vis.draw_instances(img, kpts, scores, show_kpt_idx=True)
    assert out.shape == img.shape and out.sum() > 0


def test_openpose_style(vis):
    img = np.zeros((256, 192, 3), np.uint8)
    kpts, scores = _pose()
    out = vis.draw_instances(img, kpts, scores, skeleton_style="openpose")
    assert out.shape == img.shape and out.sum() > 0
    # ellipse-filled limbs paint substantially more pixels than thin lines
    thin = vis.draw_instances(img, kpts, scores, skeleton_style="mmpose")
    assert (out.sum(-1) > 0).sum() > (thin.sum(-1) > 0).sum() * 0.5


def test_keypoint_weight_transparency(vis):
    vis.show_keypoint_weight = True
    img = np.zeros((256, 192, 3), np.uint8)
    kpts, scores = _pose()
    faint = vis.draw_instances(img, kpts, scores * 0.4, kpt_thr=0.1)
    strong = vis.draw_instances(img, kpts, np.ones_like(scores), kpt_thr=0.1)
    assert strong.sum() > faint.sum() > 0


@pytest.mark.parametrize("draw_type", ["featmap", "p_area", "contours"])
def test_heatmap_draw_types(vis, draw_type):
    img = np.full((256, 192, 3), 128, np.uint8)
    rng = np.random.RandomState(0)
    hm = np.zeros((17, 64, 48), np.float32)
    for k in range(17):
        y, x = rng.randint(8, 56), rng.randint(8, 40)
        yy, xx = np.mgrid[:64, :48]
        hm[k] = np.exp(-((yy - y) ** 2 + (xx - x) ** 2) / 8.0)
        hm[k] /= hm[k].sum()
    out = vis.draw_heatmaps(img, hm, draw_type=draw_type)
    assert out.shape == img.shape
    assert not np.array_equal(out, img)


def test_add_datasample_openpose_and_heatmap(vis, tmp_path):
    from probpose_code_tpu.structures import InstanceData, PixelData, PoseDataSample

    img = np.zeros((256, 192, 3), np.uint8)
    kpts, scores = _pose(1)
    sample = PoseDataSample()
    inst = InstanceData()
    inst.set_field(kpts, "keypoints")
    inst.set_field(scores, "keypoint_scores")
    sample.pred_instances = inst
    fields = PixelData()
    fields.set_field(np.random.RandomState(0).rand(17, 64, 48).astype(np.float32), "heatmaps")
    sample.pred_fields = fields
    out_file = str(tmp_path / "vis.jpg")
    out = vis.add_datasample(
        "t", img, sample, draw_heatmap=True, skeleton_style="openpose",
        heatmap_draw_type="p_area", out_file=out_file,
    )
    assert out.sum() > 0
    import os

    assert os.path.exists(out_file)


def test_3d_panel():
    v = Pose3dLocalVisualizer()
    v.set_dataset_meta(parse_pose_metainfo({"dataset_name": "coco"}))
    img = np.zeros((256, 192, 3), np.uint8)
    kpts3d = np.random.RandomState(0).rand(17, 3).astype(np.float32)
    out = v.draw_3d_instances(img, kpts3d)
    assert out.shape[0] == 256 and out.shape[1] > 192
