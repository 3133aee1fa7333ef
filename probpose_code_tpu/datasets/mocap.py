"""3D mocap datasets: BaseMocapDataset + Human36mDataset.

Behavioral parity targets:
- BaseMocapDataset: reference
  ``mmpose/datasets/datasets/base/base_mocap_dataset.py`` — npz annotation
  bundle with ``imgname``/``S`` (3D kpts+vis)/``part`` (2D kpts+vis)/
  ``center``/``scale``; sequences of ``seq_len`` frames with the target
  frame at the end (causal) or middle.
- Human36mDataset: reference ``datasets/body3d/h36m_dataset.py:15-300`` —
  imgname pattern ``S{subj}_{action}.{camera}_{frame}.jpg`` grouped into
  videos, optional camera parameter file.
"""

from __future__ import annotations

import copy
import os.path as osp
import pickle
from collections import defaultdict
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from probpose_code_tpu.registry import DATASETS
from probpose_code_tpu.datasets.base_dataset import Compose
from probpose_code_tpu.datasets.metainfo import parse_pose_metainfo


@DATASETS.register_module()
class BaseMocapDataset:
    METAINFO: dict = dict(dataset_name="h36m")

    def __init__(
        self,
        ann_file: str = "",
        seq_len: int = 1,
        seq_step: int = 1,
        multiple_target: int = 0,
        multiple_target_step: int = 0,
        pad_video_seq: bool = False,
        causal: bool = True,
        subset_frac: float = 1.0,
        keypoint_2d_src: str = "gt",
        keypoint_2d_det_file: Optional[str] = None,
        factor_file: Optional[str] = None,
        camera_param_file: Optional[str] = None,
        data_root: str = "",
        data_prefix: dict = dict(img=""),
        test_mode: bool = False,
        pipeline: Sequence = (),
        metainfo: Optional[dict] = None,
    ):
        self.data_root = data_root
        self.ann_file = ann_file if osp.isabs(ann_file) else osp.join(data_root, ann_file)
        self.seq_len = seq_len
        self.seq_step = seq_step
        self.multiple_target = multiple_target
        self.multiple_target_step = multiple_target_step or multiple_target
        self.pad_video_seq = pad_video_seq
        self.causal = causal
        self.subset_frac = subset_frac
        assert keypoint_2d_src in ("gt", "detection", "pipeline")
        self.keypoint_2d_src = keypoint_2d_src
        self.keypoint_2d_det_file = keypoint_2d_det_file
        self.test_mode = test_mode
        self.data_prefix = data_prefix
        self._metainfo = parse_pose_metainfo(
            metainfo or dict(from_file=self.METAINFO["dataset_name"])
        )
        self.camera_params = None
        if camera_param_file:
            path = camera_param_file if osp.isabs(camera_param_file) else osp.join(data_root, camera_param_file)
            if osp.exists(path):
                with open(path, "rb") as f:
                    self.camera_params = pickle.load(f)
        self.ann_data = self._load_ann_file(self.ann_file) if osp.exists(self.ann_file) else None
        self.pipeline = Compose(pipeline)
        self.data_list = self.load_data_list() if self.ann_data is not None else []

    def _load_ann_file(self, ann_file: str):
        """Default annotation container: flat npz bundle (imgname/S/part/...).

        Subclasses with other storage formats (e.g. COCO json for UBody3d)
        override this hook — reference ``base_mocap_dataset.py`` /
        ``ubody3d_dataset.py:93-96``.
        """
        return np.load(ann_file)

    @property
    def metainfo(self) -> dict:
        return self._metainfo

    def get_sequence_indices(self) -> List[List[int]]:
        n = len(self.ann_data["imgname"])
        _len = (self.seq_len - 1) * self.seq_step + 1
        return [list(range(i, i + _len, self.seq_step)) for i in range(0, n - _len + 1)]

    def load_data_list(self) -> List[dict]:
        num_keypoints = self._metainfo["num_keypoints"]
        ann = self.ann_data
        n = len(ann["imgname"])
        kpts_3d = ann["S"] if "S" in ann else np.zeros((n, num_keypoints, 4), np.float32)
        kpts_2d = ann["part"] if "part" in ann else np.zeros((n, num_keypoints, 3), np.float32)
        centers = ann["center"] if "center" in ann else np.zeros((n, 2), np.float32)
        scales = ann["scale"].astype(np.float32) if "scale" in ann else np.zeros(n, np.float32)

        seq_indices = self.get_sequence_indices()
        if self.subset_frac < 1.0:
            seq_indices = seq_indices[:: max(1, int(round(1.0 / self.subset_frac)))]

        data_list = []
        for idx, frame_ids in enumerate(seq_indices):
            k2d = kpts_2d[frame_ids].astype(np.float32)
            k3d = kpts_3d[frame_ids].astype(np.float32)
            target_idx = -1 if self.causal else len(frame_ids) // 2
            img_paths = [str(ann["imgname"][i]) for i in frame_ids]
            # reference base_mocap_dataset.py:350: target_img_path is the
            # list of target-frame paths — the MPJPE metric parses the H36M
            # action category (and skip_list stem) from its first entry
            target_img_path = ([img_paths[i] for i in range(self.multiple_target)]
                               if self.multiple_target else [img_paths[target_idx]])
            info = dict(
                id=idx,
                frame_ids=frame_ids,
                img_paths=img_paths,
                target_img_path=target_img_path,
                keypoints=k2d[..., :2],
                keypoints_visible=k2d[..., 2],
                lifting_target=k3d[target_idx:target_idx + 1 or None][..., :3][0]
                if self.multiple_target == 0 else k3d[..., :3],
                lifting_target_visible=k3d[target_idx:target_idx + 1 or None][..., 3][0]
                if self.multiple_target == 0 else k3d[..., 3],
                center=centers[frame_ids],
                scale=scales[frame_ids],
                target_idx=target_idx,
            )
            if self.camera_params is not None:
                info["camera_param"] = self._get_camera_param(info["img_paths"][-1])
            data_list.append(info)
        return data_list

    def _get_camera_param(self, imgname: str):
        return None

    def get_data_info(self, idx: int) -> dict:
        info = copy.deepcopy(self.data_list[idx])
        info["flip_indices"] = self._metainfo.get("flip_indices")
        info["dataset_name"] = self._metainfo["dataset_name"]
        return info

    def __len__(self) -> int:
        return len(self.data_list)

    def __getitem__(self, idx: int):
        return self.pipeline(self.get_data_info(idx))


@DATASETS.register_module()
class Human36mDataset(BaseMocapDataset):
    """Human3.6M (reference ``h36m_dataset.py:15``)."""

    METAINFO: dict = dict(dataset_name="h36m")

    @staticmethod
    def _parse_h36m_imgname(imgname: str):
        """``S1_Directions_1.54138969_000001.jpg`` -> (subj, action, camera)."""
        base = osp.basename(imgname)
        subj, rest = base.split("_", 1)
        action, rest = rest.split(".", 1)
        camera = rest.split("_")[0]
        return subj, action, camera

    def get_sequence_indices(self) -> List[List[int]]:
        imgnames = self.ann_data["imgname"]
        video_frames = defaultdict(list)
        for idx, name in enumerate(imgnames):
            video_frames[self._parse_h36m_imgname(str(name))].append(idx)
        sequence_indices: List[List[int]] = []
        _len = (self.seq_len - 1) * self.seq_step + 1
        _step = self.seq_step
        if self.multiple_target:
            for _, idxs in sorted(video_frames.items()):
                n_frame = len(idxs)
                seqs = [idxs[i:i + self.multiple_target:_step]
                        for i in range(0, n_frame, self.multiple_target_step)]
                seqs = seqs[:(n_frame + self.multiple_target_step - self.multiple_target) // self.multiple_target_step]
                sequence_indices.extend(seqs)
            return sequence_indices
        for _, idxs in sorted(video_frames.items()):
            n_frame = len(idxs)
            if self.pad_video_seq:
                frames_left = self.seq_len - 1 if self.causal else (self.seq_len - 1) // 2
                frames_right = 0 if self.causal else frames_left
                for i in range(n_frame):
                    pad_left = max(0, frames_left - i // _step)
                    pad_right = max(0, frames_right - (n_frame - 1 - i) // _step)
                    start = max(i % _step, i - frames_left * _step)
                    end = min(n_frame - (n_frame - 1 - i) % _step, i + frames_right * _step + 1)
                    seq = [idxs[0]] * pad_left + idxs[start:end:_step] + [idxs[-1]] * pad_right
                    sequence_indices.append(seq)
            else:
                for i in range(0, n_frame - _len + 1):
                    sequence_indices.append(idxs[i:i + _len:_step])
        return sequence_indices

    def _get_camera_param(self, imgname: str):
        if self.camera_params is None:
            return None
        subj, _, camera = self._parse_h36m_imgname(imgname)
        return self.camera_params.get((subj, camera))
