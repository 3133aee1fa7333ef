"""Synthetic test-data factories.

Counterpart of reference ``mmpose/testing/_utils.py``: ``get_packed_inputs``
(:95) builds a dummy collated batch (inputs + per-sample data samples with GT
instances and optional heatmap / regression / SimCC labels), ``get_coco_sample``
(:200-ish) a single raw COCO-style sample, and ``get_config_file`` /
``get_pose_estimator_cfg`` resolve configs from the repo zoo. TPU-native
differences: images are NHWC float arrays (jit-ready), no torch tensors.
"""

from __future__ import annotations

import os.path as osp
from typing import Optional, Sequence, Tuple

import numpy as np

from probpose_code_tpu.structures import InstanceData, PixelData, PoseDataSample
from probpose_code_tpu.structures.bbox import bbox_xyxy2cs

_REPO_ROOT = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))


def _rand_bboxes(rng: np.random.RandomState, num_instances: int, w: int, h: int) -> np.ndarray:
    cx, cy = rng.rand(num_instances, 2).T
    bw, bh = 0.2 + 0.6 * rng.rand(num_instances, 2).T
    tl_x = ((cx * w) - (w * bw / 2)).clip(0, w)
    tl_y = ((cy * h) - (h * bh / 2)).clip(0, h)
    br_x = ((cx * w) + (w * bw / 2)).clip(0, w)
    br_y = ((cy * h) + (h * bh / 2)).clip(0, h)
    return np.stack([tl_x, tl_y, br_x, br_y], axis=1).astype(np.float32)


def _rand_keypoints(rng: np.random.RandomState, bboxes: np.ndarray, num_keypoints: int) -> np.ndarray:
    n = bboxes.shape[0]
    rel = rng.rand(n, num_keypoints, 2)
    tl, br = bboxes[:, None, :2], bboxes[:, None, 2:]
    return (tl + rel * (br - tl)).astype(np.float32)


def get_packed_inputs(
    batch_size: int = 2,
    num_instances: int = 1,
    num_keypoints: int = 17,
    img_shape: Tuple[int, int] = (256, 192),
    input_size: Tuple[int, int] = (192, 256),
    heatmap_size: Tuple[int, int] = (48, 64),
    simcc_split_ratio: float = 2.0,
    with_heatmap: bool = True,
    with_reg_label: bool = True,
    with_simcc_label: bool = True,
):
    """Dummy collated batch: ``{"inputs": (B, H, W, 3) float32,
    "data_samples": [PoseDataSample, ...]}`` (reference ``_utils.py:95``)."""
    rng = np.random.RandomState(0)
    h, w = img_shape
    images, data_samples = [], []
    for idx in range(batch_size):
        images.append(rng.randint(0, 255, size=(h, w, 3)).astype(np.float32))

        bboxes = _rand_bboxes(rng, num_instances, w, h)
        centers, scales = bbox_xyxy2cs(bboxes)
        keypoints = _rand_keypoints(rng, bboxes, num_keypoints)
        visible = np.ones((num_instances, num_keypoints), np.float32)

        sample = PoseDataSample(
            metainfo=dict(
                id=idx, img_id=idx, img_path="<demo>.png", img_shape=img_shape,
                input_size=input_size, input_center=centers, input_scale=scales,
                flip_indices=list(range(num_keypoints)),
                ori_shape=img_shape,
            )
        )
        gt = InstanceData(
            bboxes=bboxes, bbox_scores=np.ones(num_instances, np.float32),
            keypoints=keypoints, keypoints_visible=visible, keypoints_visibility=visible.copy(),
        )
        sample.gt_instances = gt

        labels = InstanceData(keypoint_weights=visible.copy())
        if with_reg_label:
            labels.keypoint_labels = keypoints / np.asarray(input_size, np.float32)
        if with_simcc_label:
            labels.keypoint_x_labels = rng.rand(
                num_instances, num_keypoints, int(input_size[0] * simcc_split_ratio)
            ).astype(np.float32)
            labels.keypoint_y_labels = rng.rand(
                num_instances, num_keypoints, int(input_size[1] * simcc_split_ratio)
            ).astype(np.float32)
        sample.gt_instance_labels = labels

        if with_heatmap:
            hw, hh = heatmap_size
            sample.gt_fields = PixelData(heatmaps=rng.rand(num_keypoints, hh, hw).astype(np.float32))
        data_samples.append(sample)

    return {"inputs": np.stack(images), "data_samples": data_samples}


def get_coco_sample(
    img_shape: Tuple[int, int] = (240, 320),
    img_fill: Optional[int] = None,
    num_instances: int = 1,
    with_bbox_cs: bool = True,
    with_img_mask: bool = False,
    random_keypoints_visible: bool = False,
    non_occlusion: bool = False,
):
    """One raw COCO-style (pre-pipeline) sample dict (reference ``_utils.py``)."""
    rng = np.random.RandomState(1)
    h, w = img_shape
    if img_fill is None:
        img = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
    else:
        img = np.full((h, w, 3), img_fill, dtype=np.uint8)

    if non_occlusion:
        bboxes = _rand_bboxes(rng, num_instances, w // num_instances, h)
        for i in range(num_instances):
            bboxes[i, 0::2] += w // num_instances * i
    else:
        bboxes = _rand_bboxes(rng, num_instances, w, h)
    keypoints = _rand_keypoints(rng, bboxes, 17)
    if random_keypoints_visible:
        keypoints_visible = rng.randint(0, 2, (num_instances, 17)).astype(np.float32)
    else:
        keypoints_visible = np.ones((num_instances, 17), np.float32)

    data = dict(
        img=img, img_shape=img_shape, ori_shape=img_shape,
        bbox=bboxes, bbox_score=np.ones(num_instances, np.float32),
        keypoints=keypoints, keypoints_visible=keypoints_visible,
        keypoints_visibility=keypoints_visible.copy(),
        flip_indices=[0, 2, 1, 4, 3, 6, 5, 8, 7, 10, 9, 12, 11, 14, 13, 16, 15],
        id=0, img_id=0,
    )
    if with_bbox_cs:
        data["bbox_center"], data["bbox_scale"] = bbox_xyxy2cs(bboxes)
    if with_img_mask:
        data["img_mask"] = rng.randint(0, 2, (h, w), dtype=np.uint8)
    return data


def get_config_file(config_name: str) -> str:
    """Absolute path of a config under the repo ``configs/`` zoo."""
    path = osp.join(_REPO_ROOT, "configs", config_name)
    if not osp.exists(path):
        raise FileNotFoundError(f"no such config: {config_name}")
    return path


def get_pose_estimator_cfg(config_name: str):
    """Load a zoo config and return a deep copy of its ``model`` dict."""
    import copy

    from probpose_code_tpu.config import Config

    cfg = Config.fromfile(get_config_file(config_name))
    return copy.deepcopy(cfg.model)


def make_synthetic_coco(
    root: str,
    num_images: int = 64,
    instances_per_image: int = 2,
    img_size: Tuple[int, int] = (480, 640),
    num_keypoints: int = 17,
    seed: int = 0,
) -> dict:
    """Write a synthetic COCO-style keypoint dataset to disk.

    Real JPEG files + a person-keypoints annotation json — used by pipeline
    throughput benchmarks and integration tests that must exercise the full
    on-disk data path (image decode -> transform pipeline -> loader), not
    synthetic device tensors. Returns dict(root, ann_file, img_dir).
    """
    import json as _json
    import os as _os

    import cv2

    rng = np.random.RandomState(seed)
    img_dir = _os.path.join(root, "images")
    _os.makedirs(img_dir, exist_ok=True)
    h, w = img_size

    images, annotations = [], []
    ann_id = 1
    for img_id in range(1, num_images + 1):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        # blur for a realistic JPEG entropy profile (decode cost tracks detail)
        img = cv2.GaussianBlur(img, (5, 5), 2.0)
        fname = f"{img_id:08d}.jpg"
        cv2.imwrite(_os.path.join(img_dir, fname), img, [cv2.IMWRITE_JPEG_QUALITY, 90])
        images.append(dict(id=img_id, file_name=fname, width=w, height=h))
        for _ in range(instances_per_image):
            x, y = rng.randint(10, w // 2), rng.randint(10, h // 2)
            bw, bh = rng.randint(w // 5, w // 2), rng.randint(h // 3, h // 2)
            kpts = []
            num_vis = 0
            for _k in range(num_keypoints):
                kx = x + rng.rand() * bw
                ky = y + rng.rand() * bh
                v = int(rng.choice([0, 1, 2], p=[0.15, 0.25, 0.6]))
                num_vis += int(v > 0)
                kpts.extend([float(kx), float(ky), v])
            annotations.append(
                dict(
                    id=ann_id, image_id=img_id, category_id=1,
                    bbox=[float(x), float(y), float(bw), float(bh)],
                    area=float(bw * bh), iscrowd=0,
                    keypoints=kpts, num_keypoints=num_vis,
                )
            )
            ann_id += 1

    ann_file = _os.path.join(root, "annotations.json")
    with open(ann_file, "w") as f:
        _json.dump(
            dict(
                images=images,
                annotations=annotations,
                categories=[dict(id=1, name="person", supercategory="person")],
            ),
            f,
        )
    return dict(root=root, ann_file=ann_file, img_dir=img_dir)
