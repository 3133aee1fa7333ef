"""InterHand2.6M 3D hand dataset.

Parity target: reference ``mmpose/datasets/datasets/hand3d/
interhand_3d_dataset.py`` — COCO-style annotations plus separate camera /
world-joint JSON files; per image one annotation with hand type, joint
validity, and world coordinates projected to camera + pixel space. Root
(wrist) relative depths feed the Hand3DHeatmap codec and InternetHead.
"""

from __future__ import annotations

import copy
import json
import os.path as osp
from typing import List, Optional, Tuple

import numpy as np

from probpose_code_tpu.registry import DATASETS

from .base_dataset import BaseCocoStyleDataset


def _camera_to_pixel(pts_cam: np.ndarray, focal, princpt) -> np.ndarray:
    """Pinhole projection (reference ``codecs/utils/camera_image_projection.py``)."""
    z = np.clip(pts_cam[..., 2:3], 1e-8, None)
    xy = pts_cam[..., :2] / z
    return xy * np.asarray(focal, np.float32) + np.asarray(princpt, np.float32)


@DATASETS.register_module()
class InterHand3DDataset(BaseCocoStyleDataset):
    """InterHand2.6M for 3D interacting-hand estimation (42 keypoints:
    right hand 0-20, left hand 21-41; wrists at 20 / 41)."""

    METAINFO: dict = dict(dataset_name="interhand3d")

    def __init__(
        self,
        ann_file: str = "",
        camera_param_file: str = "",
        joint_file: str = "",
        use_gt_root_depth: bool = True,
        rootnet_result_file: Optional[str] = None,
        data_root: str = "",
        **kwargs,
    ):
        def _abs(p):
            return osp.join(data_root, p) if data_root and not osp.isabs(p) else p

        self.camera_param_file = _abs(camera_param_file)
        self.joint_file = _abs(joint_file)
        self.use_gt_root_depth = use_gt_root_depth
        self.rootnet_result_file = _abs(rootnet_result_file) if rootnet_result_file else None
        if not use_gt_root_depth:
            assert self.rootnet_result_file, "rootnet_result_file needed when use_gt_root_depth=False"
        super().__init__(ann_file=ann_file, data_root=data_root, **kwargs)

    def _load_annotations(self) -> Tuple[List[dict], List[dict]]:
        from .coco_api import COCO

        assert osp.exists(self.ann_file), f"Annotation file `{self.ann_file}` does not exist"
        self.coco = COCO(self.ann_file)
        with open(self.camera_param_file) as f:
            self.cameras = json.load(f)
        with open(self.joint_file) as f:
            self.joints = json.load(f)

        self._rootnet = None
        if not self.use_gt_root_depth:
            with open(self.rootnet_result_file) as f:
                self._rootnet = {str(r["annot_id"]): r for r in json.load(f)}

        instance_list, image_list = [], []
        for img_id in self.coco.getImgIds():
            img = dict(self.coco.loadImgs(img_id)[0])
            img["img_id"] = img_id
            img["img_path"] = osp.join(self.data_prefix["img"], img["file_name"])
            image_list.append(img)
            anns = self.coco.loadAnns(self.coco.getAnnIds(imgIds=img_id))
            if not anns:
                continue
            info = self.parse_data_info(dict(raw_ann_info=anns[0], raw_img_info=img))
            if info is not None:
                instance_list.append(info)
        return instance_list, image_list

    def parse_data_info(self, raw_data_info: dict) -> Optional[dict]:
        ann = raw_data_info["raw_ann_info"]
        img = raw_data_info["raw_img_info"]

        capture_id = str(img["capture"])
        camera_name = img["camera"]
        frame_idx = str(img["frame_idx"])
        cam = self.cameras[capture_id]
        campos = np.array(cam["campos"][camera_name], dtype=np.float32)
        camrot = np.array(cam["camrot"][camera_name], dtype=np.float32)
        focal = np.array(cam["focal"][camera_name], dtype=np.float32)
        princpt = np.array(cam["princpt"][camera_name], dtype=np.float32)
        joint_world = np.array(self.joints[capture_id][frame_idx]["world_coord"], dtype=np.float32)
        joint_valid = np.array(ann["joint_valid"], dtype=np.float32).flatten()

        keypoints_cam = (camrot @ (joint_world.T - campos.reshape(3, 1))).T  # (42, 3)

        if self.use_gt_root_depth:
            bbox_xywh = np.array(ann["bbox"], dtype=np.float32).reshape(1, 4)
            abs_depth = [keypoints_cam[20, 2], keypoints_cam[41, 2]]
        else:
            rn = self._rootnet[str(ann["id"])]
            bbox_xywh = np.array(rn["bbox"], dtype=np.float32).reshape(1, 4)
            abs_depth = rn["abs_depth"]
        x, y, w, h = bbox_xywh[0]
        bbox = np.array([[x, y, x + w, y + h]], dtype=np.float32)

        # root-relative depth; invalid roots invalidate the whole hand
        rel_root_depth = keypoints_cam[41, 2] - keypoints_cam[20, 2]
        rel_root_valid = joint_valid[20] * joint_valid[41]
        joint_valid[:20] *= joint_valid[20]
        joint_valid[21:] *= joint_valid[41]

        keypoints_img = _camera_to_pixel(keypoints_cam, focal, princpt)
        joints_3d = np.zeros((1, keypoints_cam.shape[0], 3), dtype=np.float32)
        joints_3d[..., :2] = keypoints_img
        joints_3d[0, :21, 2] = keypoints_cam[:21, 2] - keypoints_cam[20, 2]
        joints_3d[0, 21:, 2] = keypoints_cam[21:, 2] - keypoints_cam[41, 2]
        keypoints_visible = np.minimum(1, joint_valid).reshape(1, -1)

        return {
            "img_id": ann["image_id"],
            "img_path": img["img_path"],
            "rotation": 0,
            "keypoints": joints_3d,
            "keypoints_cam": keypoints_cam.reshape(1, -1, 3),
            "keypoints_visible": keypoints_visible,
            "keypoints_visibility": keypoints_visible.copy(),
            "hand_type": self.encode_handtype(ann["hand_type"]),
            "hand_type_valid": np.array([ann["hand_type_valid"]], dtype=np.float32),
            "rel_root_depth": rel_root_depth,
            "rel_root_valid": rel_root_valid,
            "abs_depth": abs_depth,
            "focal": focal,
            "principal_pt": princpt,
            "dataset": self._metainfo["dataset_name"],
            "bbox": bbox,
            "bbox_score": np.ones(1, dtype=np.float32),
            "num_keypoints": int(self._metainfo["num_keypoints"]),
            "iscrowd": ann.get("iscrowd", False),
            "id": ann["id"],
            "category_id": np.array(ann.get("category_id", 1)),
            "raw_ann_info": copy.deepcopy(ann),
            "source_dataset": self._metainfo["dataset_name"],
        }

    @staticmethod
    def encode_handtype(hand_type: str) -> np.ndarray:
        table = {"right": [[1, 0]], "left": [[0, 1]], "interacting": [[1, 1]]}
        assert hand_type in table, f"unsupported hand type: {hand_type}"
        return np.array(table[hand_type], dtype=np.float32)
