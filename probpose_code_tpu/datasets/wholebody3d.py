"""3D whole-body datasets: H36MWholeBodyDataset (H3WB) + UBody3dDataset.

Behavioral parity targets:
- H36MWholeBodyDataset: reference
  ``mmpose/datasets/datasets/wholebody3d/h3wb_dataset.py:12-188`` — npz bundle
  with ``train_data`` (per-subject/action/camera ``pose_2d``/``camera_3d``/
  ``frame_id``) and ``metadata`` camera parameters; S1/S5/S6 train split,
  S7 test split; 3D targets divided by 1000 (mm -> m).
- UBody3dDataset: reference
  ``mmpose/datasets/datasets/wholebody3d/ubody3d_dataset.py:14-240`` —
  COCO-format annotations carrying ``keypoints_3d``/``keypoints_valid``/
  ``camera_param`` per instance, sequences grouped by the video (trim)
  directory of each image path.
"""

from __future__ import annotations

import copy
import os.path as osp
from collections import defaultdict
from typing import List, Optional

import numpy as np

from probpose_code_tpu.registry import DATASETS
from probpose_code_tpu.datasets.coco_api import COCO
from probpose_code_tpu.datasets.mocap import BaseMocapDataset


@DATASETS.register_module()
class H36MWholeBodyDataset(BaseMocapDataset):
    """Human3.6M 3D WholeBody (H3WB, 133 kpts): 17 body + 6 foot + 68 face +
    42 hand keypoints. Reference ``h3wb_dataset.py:12``."""

    METAINFO: dict = dict(dataset_name="h3wb")

    def __init__(self, test_mode: bool = False, **kwargs):
        self.camera_order_id = ["54138969", "55011271", "58860488", "60457274"]
        self.subjects = ["S1", "S5", "S6"] if not test_mode else ["S7"]
        super().__init__(test_mode=test_mode, **kwargs)

    # The H3WB bundle is a dict-of-dicts npz, not the flat imgname/S/part
    # layout of BaseMocapDataset — override loading wholesale.
    def _load_ann_file(self, ann_file: str):
        return np.load(ann_file, allow_pickle=True)

    def load_data_list(self) -> List[dict]:
        raw = self.ann_data
        ann_data = raw["train_data"].item()
        camera_data = raw["metadata"].item()

        data_list: List[dict] = []
        instance_id = 0
        for subject in self.subjects:
            if subject not in ann_data:
                continue
            for act in ann_data[subject]:
                for cam in self.camera_order_id:
                    if cam not in ann_data[subject][act]:
                        continue
                    keypoints_2d = np.asarray(ann_data[subject][act][cam]["pose_2d"], np.float32)
                    keypoints_3d = np.asarray(ann_data[subject][act][cam]["camera_3d"], np.float32)

                    cp = camera_data[subject][cam]
                    camera_param = {
                        "K": np.asarray(cp["K"])[0, :2, ...],
                        "R": np.asarray(cp["R"])[0],
                        "T": np.asarray(cp["T"]).reshape(3, 1),
                        "Distortion": np.asarray(cp["Distortion"])[0],
                    }

                    _len = (self.seq_len - 1) * 1 + 1
                    n = len(ann_data[subject][act]["frame_id"])
                    seq_indices = [list(range(i, i + _len)) for i in range(0, n - _len + 1)]

                    for frame_ids in seq_indices:
                        k2d = keypoints_2d[frame_ids]
                        k3d = keypoints_3d[frame_ids]
                        target_idx = [-1] if self.causal else [int(self.seq_len) // 2]
                        if self.multiple_target > 0:
                            target_idx = list(range(self.multiple_target))
                        data_list.append(dict(
                            id=instance_id,
                            num_keypoints=k2d.shape[1],
                            keypoints=k2d,
                            keypoints_3d=k3d / 1000,
                            keypoints_visible=np.ones_like(k2d[..., 0], np.float32),
                            lifting_target=k3d[target_idx] / 1000,
                            lifting_target_visible=np.ones_like(k2d[..., 0], np.float32)[target_idx],
                            camera_param=camera_param,
                            img_paths=[f"{subject}/{act}/{cam}/{i:06d}.jpg" for i in frame_ids],
                            img_ids=list(frame_ids),
                            frame_ids=list(frame_ids),
                            scale=np.zeros((1, 1), np.float32),
                            center=np.zeros((1, 2), np.float32),
                            factor=np.zeros((1, 1), np.float32),
                            category_id=1,
                            iscrowd=0,
                            target_idx=target_idx,
                        ))
                        instance_id += 1
        return data_list


@DATASETS.register_module()
class UBody3dDataset(BaseMocapDataset):
    """UBody 3D whole-body (137 kpts: 25 body + 40 hand + 72 face), COCO-format
    annotations with per-instance 3D keypoints. Reference
    ``ubody3d_dataset.py:14``."""

    METAINFO: dict = dict(dataset_name="ubody3d")

    def __init__(self, multiple_target: int = 0, multiple_target_step: int = 0,
                 seq_step: int = 1, pad_video_seq: bool = False, **kwargs):
        if multiple_target > 0 and multiple_target_step == 0:
            multiple_target_step = multiple_target
        super().__init__(multiple_target=multiple_target,
                         multiple_target_step=multiple_target_step,
                         seq_step=seq_step, pad_video_seq=pad_video_seq, **kwargs)

    @staticmethod
    def _parse_image_name(image_path: str):
        """``.../<trim>/<frame>.<suffix>`` -> (trim, frame, suffix).

        Reference ``ubody3d_dataset.py:156-167``.
        """
        trim, file_name = image_path.split("/")[-2:]
        frame_id, suffix = file_name.split(".")
        return trim, frame_id, suffix

    def _load_ann_file(self, ann_file: str):
        return COCO(ann_file)

    def load_data_list(self) -> List[dict]:
        coco = self.ann_data
        num_keypoints = self._metainfo["num_keypoints"]

        video_frames = defaultdict(list)
        for img_id in coco.getImgIds():
            img_info = coco.loadImgs(img_id)[0]
            subj, _, _ = self._parse_image_name(img_info["file_name"])
            video_frames[subj].append(img_id)

        sequence_indices: List[List[int]] = []
        _len = (self.seq_len - 1) * self.seq_step + 1
        _step = self.seq_step
        if self.multiple_target:
            for _, img_ids in sorted(video_frames.items()):
                n_frame = len(img_ids)
                ann_ids = coco.getAnnIds(imgIds=img_ids)
                seqs = [ann_ids[i:i + self.multiple_target:_step]
                        for i in range(0, n_frame, self.multiple_target_step)]
                seqs = seqs[:(n_frame + self.multiple_target_step - self.multiple_target)
                            // self.multiple_target_step]
                sequence_indices.extend(seqs)
        else:
            for _, img_ids in sorted(video_frames.items()):
                n_frame = len(img_ids)
                ann_ids = coco.getAnnIds(imgIds=img_ids)
                if self.pad_video_seq:
                    frames_left = self.seq_len - 1 if self.causal else (self.seq_len - 1) // 2
                    frames_right = 0 if self.causal else frames_left
                    for i in range(n_frame):
                        pad_left = max(0, frames_left - i // _step)
                        pad_right = max(0, frames_right - (n_frame - 1 - i) // _step)
                        start = max(i % _step, i - frames_left * _step)
                        end = min(n_frame - (n_frame - 1 - i) % _step, i + frames_right * _step + 1)
                        sequence_indices.append([ann_ids[0]] * pad_left
                                                + ann_ids[start:end:_step]
                                                + [ann_ids[-1]] * pad_right)
                else:
                    sequence_indices.extend(
                        ann_ids[i:i + _len:_step] for i in range(0, n_frame - _len + 1, _step))

        if self.subset_frac < 1.0:
            subset_size = int(len(sequence_indices) * self.subset_frac)
            sequence_indices = sequence_indices[:subset_size]

        expected = self.multiple_target if self.multiple_target else self.seq_len
        data_list: List[dict] = []
        for i, ann_ids in enumerate(sequence_indices):
            assert len(ann_ids) == expected, (
                f"Expected `frame_ids` == {expected}, but got {len(ann_ids)}")
            anns = coco.loadAnns(ann_ids)
            img_ids = [ann["image_id"] for ann in anns]
            kpts = np.array([np.asarray(a["keypoints"], np.float32).reshape(num_keypoints, -1)[:, :2]
                             for a in anns], np.float32)
            kpts_3d = np.array([np.asarray(a["keypoints_3d"], np.float32).reshape(num_keypoints, -1)[:, :3]
                                for a in anns], np.float32)
            vis = np.array([np.asarray(a["keypoints_valid"], np.float32).reshape(num_keypoints)
                            for a in anns], np.float32)
            imgs = coco.loadImgs(img_ids)
            img_paths = np.array([img["file_name"] for img in imgs])

            target_idx = [-1] if self.causal else [int(self.seq_len // 2)]
            if self.multiple_target:
                target_idx = list(range(self.multiple_target))

            cam_param = dict(anns[-1].get("camera_param", {}))
            cam_param.setdefault("w", 1000)
            cam_param.setdefault("h", 1000)

            data_list.append(dict(
                id=i,
                num_keypoints=num_keypoints,
                keypoints=kpts,
                keypoints_3d=kpts_3d,
                keypoints_visible=vis,
                lifting_target=kpts_3d[target_idx],
                lifting_target_visible=vis[target_idx],
                target_img_paths=list(img_paths[target_idx]),
                img_paths=list(img_paths),
                img_ids=[img["id"] for img in imgs],
                frame_ids=[img["id"] for img in imgs],
                camera_param=cam_param,
                scale=np.zeros(len(imgs), np.float32),
                center=np.zeros((len(imgs), 2), np.float32),
                factor=np.zeros((kpts_3d.shape[0],), np.float32),
                category_id=1,
                iscrowd=0,
                target_idx=target_idx,
            ))
        return data_list
