"""probpose_code_tpu.testing factories (reference mmpose/testing/_utils.py)."""

import numpy as np


def test_get_packed_inputs():
    from probpose_code_tpu.testing import get_packed_inputs

    batch = get_packed_inputs(batch_size=3, num_instances=2, num_keypoints=5,
                              heatmap_size=(24, 32))
    assert batch["inputs"].shape == (3, 256, 192, 3)
    assert len(batch["data_samples"]) == 3
    s = batch["data_samples"][0]
    assert s.gt_instances.keypoints.shape == (2, 5, 2)
    assert s.gt_instances.bboxes.shape == (2, 4)
    assert s.gt_fields.heatmaps.shape == (5, 32, 24)
    assert s.gt_instance_labels.keypoint_x_labels.shape == (2, 5, 384)
    assert s.metainfo["input_size"] == (192, 256)


def test_get_coco_sample():
    from probpose_code_tpu.testing import get_coco_sample

    data = get_coco_sample(num_instances=2, non_occlusion=True, with_img_mask=True)
    assert data["img"].shape == (240, 320, 3)
    assert data["keypoints"].shape == (2, 17, 2)
    assert data["bbox_center"].shape == (2, 2)
    assert data["img_mask"].shape == (240, 320)
    # non-occlusion puts instances in disjoint horizontal strips
    assert data["bbox"][0, 2] <= data["bbox"][1, 0] + 160


def test_get_pose_estimator_cfg():
    from probpose_code_tpu.testing import get_config_file, get_pose_estimator_cfg

    path = get_config_file(
        "body_2d_keypoint/topdown_probmap/coco/td-pm_ProbPose-small_8xb64-210e_coco-256x192.py")
    assert path.endswith(".py")
    model = get_pose_estimator_cfg(
        "body_2d_keypoint/topdown_probmap/coco/td-pm_ProbPose-small_8xb64-210e_coco-256x192.py")
    assert model["head"]["type"] == "ProbMapHead"
