"""PoseTrack18 video dataset: multi-frame top-down samples.

Parity target: reference ``mmpose/datasets/datasets/body/
posetrack18_video_dataset.py:16`` — each sample carries the center frame
plus sampled supporting frames (``frame_sampler_mode`` 'random' within
``frame_range`` at train time, 'fixed' ``frame_indices`` at test time) and
per-frame ``frame_weights``. Frame paths follow the PoseTrack layout
(zero-padded frame index filenames within a sequence directory).
"""

from __future__ import annotations

import os.path as osp
from typing import List, Optional, Sequence, Union

import numpy as np

from probpose_code_tpu.registry import DATASETS
from probpose_code_tpu.structures.keypoint import find_min_padding_exact

from .base_dataset import BaseCocoStyleDataset


@DATASETS.register_module()
class PoseTrack18VideoDataset(BaseCocoStyleDataset):
    METAINFO: dict = dict(dataset_name="posetrack18")

    def __init__(
        self,
        ann_file: str = "",
        frame_weights: List[float] = [0.0, 1.0],
        frame_sampler_mode: str = "random",
        frame_range: Optional[Union[int, List[int]]] = None,
        num_sampled_frame: Optional[int] = None,
        frame_indices: Optional[Sequence[int]] = None,
        ph_fill_len: int = 6,
        **kwargs,
    ):
        assert abs(sum(frame_weights) - 1.0) < 1e-6, f"frame_weights must sum to 1, got {frame_weights}"
        assert all(w >= 0 for w in frame_weights)
        self.frame_weights = np.array(frame_weights, dtype=np.float32)

        assert frame_sampler_mode in ("fixed", "random"), frame_sampler_mode
        self.frame_sampler_mode = frame_sampler_mode
        if frame_sampler_mode == "random":
            assert frame_range is not None, "'random' sampling needs frame_range"
            if isinstance(frame_range, int):
                assert frame_range >= 0
                self.frame_range = [-frame_range, frame_range]
            else:
                assert len(frame_range) == 2 and frame_range[0] <= 0 <= frame_range[1]
                self.frame_range = list(frame_range)
            assert num_sampled_frame is not None, "'random' sampling needs num_sampled_frame"
            assert len(frame_weights) == num_sampled_frame + 1
            self.num_sampled_frame = num_sampled_frame
            self.frame_indices = None
        else:
            assert frame_indices is not None, "'fixed' sampling needs frame_indices"
            assert len(frame_weights) == len(frame_indices)
            self.frame_indices = sorted(frame_indices)
            self.frame_range = None
            self.num_sampled_frame = None
        self.ph_fill_len = ph_fill_len
        super().__init__(ann_file=ann_file, **kwargs)

    def parse_data_info(self, raw_data_info: dict) -> Optional[dict]:
        ann = raw_data_info["raw_ann_info"]
        img = raw_data_info["raw_img_info"]
        if "bbox" not in ann or "keypoints" not in ann or max(ann["keypoints"]) == 0:
            return None

        img_w, img_h = img["width"], img["height"]
        x, y, w, h = ann["bbox"]
        bbox = np.array(
            [
                np.clip(x, 0, img_w - 1),
                np.clip(y, 0, img_h - 1),
                np.clip(x + w, 0, img_w - 1),
                np.clip(y + h, 0, img_h - 1),
            ],
            dtype=np.float32,
        ).reshape(1, 4)

        _keypoints = np.array(ann["keypoints"], dtype=np.float32).reshape(1, -1, 3)
        keypoints = _keypoints[..., :2]
        keypoints_visible = np.minimum(1, _keypoints[..., 2])
        keypoints_visibility = (_keypoints[..., 2] == 2).astype(np.float32)

        # center frame first, then the sampled supporting frames
        center_img_path = osp.join(self.data_prefix["img"], img["file_name"])
        img_paths = [center_img_path]
        if self.frame_sampler_mode == "fixed":
            indices = self.frame_indices
        else:
            low, high = self.frame_range
            indices = np.random.randint(low, high + 1, self.num_sampled_frame)

        nframes = int(img.get("nframes", 1))
        ref_idx = int(osp.splitext(osp.basename(img["file_name"]))[0])
        for idx in indices:
            if self.test_mode and idx == 0:
                continue
            support_idx = int(np.clip(ref_idx + idx, 0, nframes - 1))
            img_paths.append(
                osp.join(osp.dirname(center_img_path), str(support_idx).zfill(self.ph_fill_len) + ".jpg")
            )

        return {
            "img_id": int(img.get("frame_id", img["img_id"])),
            "img_path": img_paths,
            "bbox": bbox,
            "bbox_score": np.ones(1, dtype=np.float32),
            "num_keypoints": ann.get("num_keypoints", int(keypoints_visible.sum())),
            "keypoints": keypoints,
            "keypoints_visible": keypoints_visible,
            "keypoints_visibility": keypoints_visibility,
            "pad_to_contain": find_min_padding_exact(bbox, _keypoints.reshape(-1, 3)),
            "area": np.clip((bbox[0, 2] - bbox[0, 0]) * (bbox[0, 3] - bbox[0, 1]) * 0.53, 1.0, None),
            "frame_weights": self.frame_weights,
            "iscrowd": ann.get("iscrowd", 0),
            "id": ann["id"],
            "category_id": np.array(ann.get("category_id", 1)),
            "raw_ann_info": dict(ann),
            "source_dataset": self._metainfo["dataset_name"],
        }
